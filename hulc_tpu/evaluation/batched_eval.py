"""Batched LH-MTLC evaluation: N rollouts advance in lockstep through ONE
jitted policy step.

The reference evaluates 1000 chains sequentially and fans out over 8 GPUs by
process (run_multiple.py). On TPU the policy step is a tiny batch-1 program
— the chip idles between env steps and every step pays a dispatch round
trip. Batching E environments into one (E, ...) policy step amortizes both:
with E=64 the per-env cost drops ~50x, and a full 1000-chain protocol runs
in minutes instead of hours.

Environments advance independently (each on its own chain position /
instruction); replanning is per-env via masked plan/goal updates so the
batched step stays shape-static. Works with any env factory returning
independent env instances with the standard contract.
"""

from __future__ import annotations

import collections
import json
import pathlib
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hulc_tpu.config import HulcConfig
from hulc_tpu.data.dataset import DatasetStatistics
from hulc_tpu.evaluation.lh_eval import CHAIN_LEN, get_sequences
from hulc_tpu.evaluation.policy import StateObsNormalizer
from hulc_tpu.evaluation.tasks import SceneObsTasks
from hulc_tpu.models import make_model
from hulc_tpu.models.decoders import decoder_carry
from hulc_tpu.models.hulc import ModalityBatch
from hulc_tpu.ops.image_ops import preprocess_rgb_seq


def build_batched_step(model, cfg: HulcConfig):
    """The lockstep batched policy step as a pure function, shared by
    :class:`BatchedHulcPolicy` and the serving exporter (serving/export.py).
    """

    def _prep(img):
        return preprocess_rgb_seq(img, None, 0) if img is not None else None

    def _encode(params, rgb_static, rgb_gripper, rob_norm):
        e = rob_norm.shape[0]
        batch = ModalityBatch(
            rgb_static=_prep(rgb_static),
            rgb_gripper=_prep(rgb_gripper),
            robot_obs=rob_norm,
            actions=jnp.zeros((e, 1, 7)),
            state_info_robot_obs=jnp.zeros((e, 1, 15)),
        )
        emb, _ = model.apply({"params": params}, batch, method=model.encode)
        return emb

    def step_fn(params, rng, rgb_static, rgb_gripper, rob_norm, rob_raw,
                lang_emb, plan, latent_goal, carry, replan_mask):
        """One lockstep batched policy step.

        replan_mask: (E,) bool — lanes that (re)plan this step. New plan
        and goal are computed for ALL lanes (batched) and merged in via
        where; carries of replanning lanes reset to zero.
        """
        k_plan, k_act = jax.random.split(rng)
        emb = _encode(params, rgb_static, rgb_gripper, rob_norm)  # (E, 1, F)
        new_goal = model.apply({"params": params}, lang_emb, method=model.encode_language_goal)
        new_plan = model.apply(
            {"params": params}, k_plan, emb, new_goal, method=model.propose_plan
        )
        m = replan_mask[:, None]
        plan = jnp.where(m, new_plan, plan) if plan.shape[-1] else plan
        latent_goal = jnp.where(m, new_goal, latent_goal)
        zero_carry = decoder_carry(cfg.action_decoder, rob_norm.shape[0])

        def reset_leaf(z, c):
            if c.ndim < 2:  # stateless mlp decoder carry, shape (0,)
                return c
            return jnp.where(replan_mask.reshape((1, -1) + (1,) * (c.ndim - 2)), z, c)

        carry = jax.tree.map(reset_leaf, zero_carry, carry)
        action, carry = model.apply(
            {"params": params}, k_act, plan, emb, latent_goal, rob_raw, carry,
            method=model.decoder_act,
        )
        return action[:, 0], plan, latent_goal, carry

    return step_fn


class BatchedHulcPolicy:
    """Vectorized reset/step over E concurrent rollouts.

    State is a pytree of (E, ...) arrays; `reset_mask` selectively restarts
    individual lanes (new instruction) without touching the others.
    """

    def __init__(
        self,
        cfg: HulcConfig,
        params,
        num_envs: int,
        statistics: Optional[DatasetStatistics] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.model = make_model(cfg)
        self.params = params
        self.num_envs = num_envs
        self._state_norm = StateObsNormalizer(cfg, statistics)
        self.replan_freq = cfg.replan_freq
        self._rng = jax.random.key(seed)
        self._step = jax.jit(build_batched_step(self.model, cfg))

    def initial_state(self):
        e = self.num_envs
        plan_dim = 0 if self.cfg.model_kind == "gcbc" else self.cfg.distribution.plan_dim
        return (
            jnp.zeros((e, plan_dim), jnp.float32),
            jnp.zeros((e, self.cfg.visual_goal.latent_goal_features), jnp.float32),
            decoder_carry(self.cfg.action_decoder, e),
        )

    def step(self, obs_batch: List[Dict], lang_embs: np.ndarray, state, replan_mask: np.ndarray):
        """obs_batch: list of E env obs dicts. Returns (actions (E,7), state)."""
        pe = self.cfg.perceptual_encoder
        rgb_static = (
            np.stack([o["rgb_obs"]["rgb_static"] for o in obs_batch])[:, None]
            if pe.rgb_static is not None
            else None
        )
        rgb_gripper = (
            np.stack([o["rgb_obs"]["rgb_gripper"] for o in obs_batch])[:, None]
            if pe.rgb_gripper is not None
            else None
        )
        rob_raw = np.stack([o["robot_obs"] for o in obs_batch]).astype(np.float32)[:, None]
        scene_raw = (
            np.stack([o["scene_obs"] for o in obs_batch]).astype(np.float32)[:, None]
            if self._state_norm.include_scene and "scene_obs" in obs_batch[0]
            else None
        )
        rob_norm = self._state_norm(rob_raw, scene_raw)
        self._rng, k = jax.random.split(self._rng)
        plan, goal, carry = state
        actions, plan, goal, carry = self._step(
            self.params, k, rgb_static, rgb_gripper, rob_norm, rob_raw,
            jnp.asarray(lang_embs, jnp.float32), plan, goal, carry,
            jnp.asarray(replan_mask, bool),
        )
        return np.asarray(actions), (plan, goal, carry)


def evaluate_policy_batched(
    cfg: HulcConfig,
    params,
    env_factory: Optional[Callable[[], object]] = None,
    num_sequences: int = 1000,
    num_envs: int = 64,
    ep_len: int = 360,
    oracle: Optional[SceneObsTasks] = None,
    sequences: Optional[List[List[str]]] = None,
    lang_embeddings: Optional[Dict[str, np.ndarray]] = None,
    statistics: Optional[DatasetStatistics] = None,
    epoch: int = 0,
    output_dir=None,
    seed: int = 0,
    envs: Optional[List] = None,
    policy: Optional[BatchedHulcPolicy] = None,
    results_name: str = "results.json",
    initial_states: Optional[List] = None,
    num_videos: int = 0,
    video_dir=None,
    tsne_path=None,
) -> Dict:
    """LH-MTLC protocol with E lockstep environments.

    Each env lane works through its own queue of chains; a lane moves to the
    next instruction on success, aborts its chain on timeout, and pulls the
    next chain when done. Results schema identical to lh_eval.evaluate_policy.
    """
    oracle = oracle or SceneObsTasks()
    if sequences is None:
        from hulc_tpu.data.language import restrict_task_pool
        from hulc_tpu.evaluation.tasks import ALL_TASKS

        pool = restrict_task_pool(lang_embeddings, ALL_TASKS)
        print(
            "[batched_eval] WARNING: no chains supplied — falling back to "
            "UNIFORM task sampling (not the official LH-MTLC protocol; use "
            "chain_sampler.get_sequences for comparable numbers)."
        )
        sequences = get_sequences(num_sequences, tasks=pool, seed=seed)
    lang_embeddings = lang_embeddings or {}
    lang_dim = (
        next(iter(lang_embeddings.values())).shape[-1] if lang_embeddings else cfg.lang_dim
    )
    # no lane should outnumber the work: idle lanes would never receive an
    # observation (and a bigger policy batch is pure waste)
    num_envs = min(num_envs, len(sequences))
    # a pre-built policy's compiled step is batch-size-specialized (and a
    # serving.ServedBatchedPolicy's exported step is FIXED at lanes=E) —
    # never drive more lanes than it was built for
    if policy is not None:
        num_envs = min(num_envs, policy.num_envs)
    if envs is None:
        envs = [env_factory() for _ in range(num_envs)]
    else:
        envs = envs[:num_envs] if len(envs) > num_envs else envs
        num_envs = len(envs)
    if policy is None:
        policy = BatchedHulcPolicy(cfg, params, num_envs, statistics, seed)
    elif params is not None:
        policy.params = params  # reuse compiled step across checkpoints
    state = policy.initial_state()

    chain_queue = collections.deque(enumerate(sequences))
    # per-lane trackers
    lane_chain = [None] * num_envs  # (chain_idx, tasks list)
    lane_pos = [0] * num_envs
    lane_steps = [0] * num_envs
    lane_start_info = [None] * num_envs
    lane_obs = [None] * num_envs
    lane_frames = [None] * num_envs  # video capture (reference rollout_lh num_videos)
    done_counts = {}
    task_attempts = collections.defaultdict(int)
    task_successes = collections.defaultdict(int)
    # latent-plan dump (reference tsne_data_<epoch>.npz schema, sequential
    # parity in lh_eval): one (plan, goal) sample per attempted subtask,
    # captured at subtask start. Samples stay DEVICE-resident tiny slices
    # (async dispatch, no per-capture D2H sync — on the tunneled runtime a
    # blocking fetch per capture would cost ~30 ms RTT x ~5000 subtasks);
    # one stacked fetch at the end.
    tsne_pending = [False] * num_envs
    tsne_rows: List = []  # (chain_idx, task, plan_slice, goal_slice)

    def start_lane(i) -> bool:
        if not chain_queue:
            lane_chain[i] = None
            lane_frames[i] = None
            return False  # lane_obs[i] keeps the last observation (batch filler)
        idx, chain = chain_queue.popleft()
        lane_chain[i] = (idx, chain)
        lane_pos[i] = 0
        lane_steps[i] = 0
        tsne_pending[i] = tsne_path is not None
        if initial_states is not None:
            robot_obs, scene_obs = initial_states[idx % len(initial_states)]
            lane_obs[i] = envs[i].reset(robot_obs=robot_obs, scene_obs=scene_obs)
        else:
            lane_obs[i] = envs[i].reset()
        lane_start_info[i] = envs[i].get_info()
        task_attempts[chain[0]] += 1
        if idx < num_videos and video_dir is not None:
            lane_frames[i] = [np.asarray(lane_obs[i]["rgb_obs"]["rgb_static"])]
        else:
            lane_frames[i] = None
        return True

    def finish_video(i, idx):
        if lane_frames[i]:
            from hulc_tpu.evaluation.lh_eval import save_video

            save_video(lane_frames[i], pathlib.Path(video_dir) / f"chain_{idx:04d}")
        lane_frames[i] = None

    def default_emb(task):
        return lang_embeddings.get(task, np.zeros(lang_dim, np.float32))

    for i in range(num_envs):
        start_lane(i)

    replan = np.ones(num_envs, bool)
    t_start = last_print = time.time()
    lockstep_iters = 0
    while any(c is not None for c in lane_chain):
        lockstep_iters += 1
        if time.time() - last_print > 30:
            last_print = time.time()
            rate = lockstep_iters * num_envs / (last_print - t_start)
            print(
                f"[batched_eval] {len(done_counts)}/{len(sequences)} chains done, "
                f"{rate:.0f} env-steps/s ({(last_print - t_start):.0f} s elapsed)",
                flush=True,
            )
        active = [i for i in range(num_envs) if lane_chain[i] is not None]
        obs_batch = [lane_obs[i] for i in range(num_envs)]
        embs = np.stack([
            default_emb(lane_chain[i][1][lane_pos[i]])
            if lane_chain[i]
            else np.zeros(lang_dim, np.float32)
            for i in range(num_envs)
        ])
        replan_in = replan
        actions, state = policy.step(obs_batch, embs, state, replan)
        if tsne_path is not None:
            plan_d, goal_d = state[0], state[1]
            for i in active:
                if tsne_pending[i] and replan_in[i]:
                    idx_i, chain_i = lane_chain[i]
                    tsne_rows.append((idx_i, chain_i[lane_pos[i]], plan_d[i], goal_d[i]))
                    tsne_pending[i] = False
        replan = np.zeros(num_envs, bool)
        for i in active:
            lane_obs[i] = envs[i].step(actions[i])
            lane_steps[i] += 1
            idx, chain = lane_chain[i]
            if lane_frames[i] is not None:
                lane_frames[i].append(np.asarray(lane_obs[i]["rgb_obs"]["rgb_static"]))
            task = chain[lane_pos[i]]
            success = task in oracle.get_task_info_for_set(
                lane_start_info[i], envs[i].get_info(), {task}
            )
            timeout = lane_steps[i] >= ep_len
            if success:
                task_successes[task] += 1
                lane_pos[i] += 1
                if lane_pos[i] >= len(chain):
                    done_counts[idx] = len(chain)
                    finish_video(i, idx)
                    replan[i] = start_lane(i)
                else:
                    task_attempts[chain[lane_pos[i]]] += 1
                    lane_steps[i] = 0
                    lane_start_info[i] = envs[i].get_info()
                    replan[i] = True
                    tsne_pending[i] = tsne_path is not None
            elif timeout:
                done_counts[idx] = lane_pos[i]
                finish_video(i, idx)
                replan[i] = start_lane(i)
            elif lane_steps[i] % policy.replan_freq == 0:
                replan[i] = True

    if tsne_path is not None and tsne_rows:
        # consolidate the device-resident slices with a handful of stacked
        # fetches (not one D2H per row)
        tsne_path = pathlib.Path(tsne_path)
        tsne_path.parent.mkdir(parents=True, exist_ok=True)

        def fetch(col):
            blocks = [
                np.asarray(jnp.stack([r[col] for r in tsne_rows[lo : lo + 512]]))
                for lo in range(0, len(tsne_rows), 512)
            ]
            return np.concatenate(blocks).astype(np.float32)

        np.savez(
            tsne_path,
            ids=np.asarray([r[0] for r in tsne_rows], np.int64),
            labels=np.asarray([r[1] for r in tsne_rows]),
            latent_goals=fetch(3),
            plans=fetch(2).reshape(len(tsne_rows), -1),
        )

    from hulc_tpu.evaluation.lh_eval import build_results, write_results

    chain_successes = np.zeros(CHAIN_LEN, np.int64)
    for done in done_counts.values():
        for k in range(done):
            chain_successes[k] += 1
    results = build_results(
        epoch, list(done_counts.values()), chain_successes, len(sequences),
        task_successes, task_attempts,
    )
    write_results(results, output_dir, results_name)
    results["_policy"] = policy  # caller may reuse the compiled policy
    return results
