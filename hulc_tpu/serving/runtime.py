"""Model-code-free serving runtime for exported policy artifacts.

Loads a directory written by :func:`hulc_tpu.serving.export.export_policy`
and serves the CalvinBaseModel reset()/step() contract (and the lockstep
batched step) from the serialized StableHLO alone — no flax modules, no
config system, no model weights code path. Everything shape- or
semantics-bearing comes from ``meta.json``:

  * obs normalization (keep_indices / dataset statistics / include_scene),
  * replan cadence,
  * decoder-carry pytree template,
  * camera presence and resolutions.

Mirrors evaluation/policy.py::HulcPolicy.step's replan/act state machine
exactly (tested action-for-action in tests/test_serving.py).
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hulc_tpu.serving.params_io import unflatten_params


def _commit(x):
    """Commit to the default device (explicit device => committed array).

    Committed arrays keep the deserialized call's argument signature
    identical between the first step (fresh zero state) and steady state
    (state = previous jit output, which is committed): an uncommitted
    jnp.zeros carry makes jit(exp.call) recompile the entire module on the
    second step when the carry's sharding flips Unspecified -> committed
    (~5 s/recompile at debug size, diagnosed via jax_log_compiles).
    """
    return jax.device_put(x, jax.local_devices()[0])


def _zero_carry(spec: Dict, batch: int):
    if spec["rnn_cell"] == "mlp":
        return _commit(jnp.zeros((0,), jnp.float32))
    shape = (spec["num_layers"], batch, spec["hidden_size"])
    h = _commit(jnp.zeros(shape, jnp.float32))
    if spec["rnn_cell"] == "lstm":
        return (h, _commit(jnp.zeros(shape, jnp.float32)))
    return h


class _MetaNormalizer:
    """StateObsNormalizer semantics rebuilt from meta.json (no config)."""

    def __init__(self, meta: Dict):
        p = meta["proprio"]
        self.keep = [tuple(k) for k in p["keep"]]
        self.normalize = p["normalize"]
        self.include_scene = p["include_scene"]
        self.rob_mean = np.asarray(p["robot_obs_mean"], np.float32)
        self.rob_std = np.asarray(p["robot_obs_std"], np.float32)
        self.scene_mean = np.asarray(p["scene_obs_mean"], np.float32)
        self.scene_std = np.asarray(p["scene_obs_std"], np.float32)

    def __call__(self, rob_raw: np.ndarray, scene_raw=None) -> np.ndarray:
        def norm(x, mean, std):
            return (x - mean) / np.maximum(std, 1e-6) if self.normalize else x

        state = norm(rob_raw, self.rob_mean, self.rob_std)
        if self.include_scene:
            if scene_raw is None:
                raise ValueError("artifact was exported with include_scene=True; obs needs scene_obs")
            state = np.concatenate(
                [state, norm(scene_raw, self.scene_mean, self.scene_std)], axis=-1
            )
        return np.concatenate(
            [state[..., a:b] for a, b in self.keep], axis=-1
        ).astype(np.float32)


class _Artifact:
    def __init__(self, artifact_dir):
        from jax import export as jexport

        self.dir = pathlib.Path(artifact_dir)
        self.meta = json.loads((self.dir / "meta.json").read_text())
        if self.meta["format_version"] != 1:
            raise ValueError(f"unsupported artifact format {self.meta['format_version']}")
        with np.load(self.dir / "params.npz") as z:
            self.params = unflatten_params({k: z[k] for k in z.files})
        self._fns = {}
        for blob_path in self.dir.glob("*.jaxexp"):
            exp = jexport.deserialize(bytearray(blob_path.read_bytes()))
            self._fns[blob_path.stem] = jax.jit(exp.call)
        self.norm = _MetaNormalizer(self.meta)
        emb_path = self.dir / "lang_embeddings.npy"
        self.lang_embeddings: Dict[str, np.ndarray] = (
            np.load(emb_path, allow_pickle=True).item() if emb_path.exists() else {}
        )

    def fn(self, name: str):
        if name not in self._fns:
            raise KeyError(
                f"artifact {self.dir} has no '{name}.jaxexp' "
                f"(available: {sorted(self._fns)})"
            )
        return self._fns[name]

    def zero_obs(self, batch: int = 1) -> Dict:
        """A zero observation matching the artifact's camera/proprio spec
        (for warm-up compiles before serving traffic)."""
        cams = self.meta["cameras"]
        obs: Dict = {"robot_obs": np.zeros((15,), np.float32), "rgb_obs": {}}
        if cams["rgb_static"] is not None:
            px = cams["rgb_static"]
            obs["rgb_obs"]["rgb_static"] = np.zeros((px, px, 3), np.uint8)
        if cams["rgb_gripper"] is not None:
            px = cams["rgb_gripper"]
            obs["rgb_obs"]["rgb_gripper"] = np.zeros((px, px, 3), np.uint8)
        if self.norm.include_scene:
            obs["scene_obs"] = np.zeros_like(self.norm.scene_mean)
        return obs

    def split_obs(self, obs: Dict):
        cams = self.meta["cameras"]
        rgb = obs.get("rgb_obs", {})
        rgb_static = (
            np.asarray(rgb["rgb_static"], np.uint8)[None, None]
            if cams["rgb_static"] is not None
            else None
        )
        rgb_gripper = (
            np.asarray(rgb["rgb_gripper"], np.uint8)[None, None]
            if cams["rgb_gripper"] is not None
            else None
        )
        rob_raw = np.asarray(obs["robot_obs"], np.float32).reshape(1, 1, 15)
        scene_raw = (
            np.asarray(obs["scene_obs"], np.float32).reshape(1, 1, -1)
            if self.norm.include_scene and "scene_obs" in obs
            else None
        )
        return rgb_static, rgb_gripper, self.norm(rob_raw, scene_raw), rob_raw


class ServedPolicy:
    """HulcPolicy-compatible reset()/step(obs, goal) from an artifact dir."""

    def __init__(self, artifact_dir, seed: int = 0):
        self._art = _Artifact(artifact_dir)
        self.meta = self._art.meta
        self.params = self._art.params
        self.replan_freq = self.meta["replan_freq"]
        self.lang_embeddings = self._art.lang_embeddings
        self._base_rng = jax.random.key(seed)
        self._rng = self._base_rng
        self._plan = None
        self._goal = None
        self._carry = None
        self._step_count = 0

    def reset(self) -> None:
        # restart the RNG stream from the base key, like HulcPolicy.reset()
        # (policy.py seeds each episode's PolicyState from _base_rng) — so
        # served-vs-live action parity holds on every episode, not just the
        # first one
        self._rng = self._base_rng
        self._plan = None
        self._step_count = 0

    def warmup(self) -> None:
        """Compile every exported path (lang replan, vision replan, act)
        before serving traffic. Leaves policy state untouched."""
        saved = (self._rng, self._plan, self._goal, self._carry, self._step_count)
        obs = self._art.zero_obs()
        self.reset()
        self.step(obs, np.zeros((self.meta["lang_dim"],), np.float32))
        self.reset()
        self.step(obs, obs)
        self._rng, self._plan, self._goal, self._carry, self._step_count = saved

    def load_lang_embeddings(self, embeddings_path) -> None:
        embeddings = np.load(embeddings_path, allow_pickle=True).item()
        self.lang_embeddings = {
            v["ann"][0]: np.asarray(v["emb"]).reshape(-1) for v in embeddings.values()
        }

    def step(self, obs: Dict, goal) -> np.ndarray:
        art = self._art
        rgb_static, rgb_gripper, rob_norm, rob_raw = art.split_obs(obs)
        if self._plan is None or self._step_count % self.replan_freq == 0:
            self._rng, k = jax.random.split(self._rng)
            kd = jax.random.key_data(k)
            if isinstance(goal, str) or isinstance(goal, (np.ndarray, jax.Array)):
                emb = self.lang_embeddings[goal] if isinstance(goal, str) else np.asarray(goal)
                self._plan, self._goal = art.fn("replan_lang")(
                    self.params, kd, rgb_static, rgb_gripper, rob_norm,
                    jnp.asarray(emb, jnp.float32).reshape(1, -1),
                )
            else:
                g_static, g_gripper, g_norm, _ = art.split_obs(goal)

                def _cat(a, b):
                    return np.concatenate([a, b], axis=1) if a is not None else None

                self._plan, self._goal = art.fn("replan_vision")(
                    self.params, kd,
                    _cat(rgb_static, g_static), _cat(rgb_gripper, g_gripper),
                    np.concatenate([rob_norm, g_norm], axis=1),
                )
            self._carry = _zero_carry(self.meta["carry"], 1)

        self._rng, k_act = jax.random.split(self._rng)
        action, self._carry = art.fn("act")(
            self.params, jax.random.key_data(k_act), self._plan, self._goal,
            rgb_static, rgb_gripper, rob_norm, rob_raw, self._carry,
        )
        self._step_count += 1
        return np.asarray(action[0])


class ServedBatchedPolicy:
    """BatchedHulcPolicy-compatible lockstep stepper from an artifact with a
    ``step_batched.jaxexp`` (exported with lanes=E). Drop-in for
    evaluation.batched_eval.evaluate_policy_batched(policy=...)."""

    def __init__(self, artifact_dir, seed: int = 0):
        self._art = _Artifact(artifact_dir)
        self.meta = self._art.meta
        self.params = self._art.params
        if not self.meta.get("lanes"):
            raise ValueError(
                "artifact has no batched step — export with lanes=E "
                "(serving.export.export_policy(..., lanes=E))"
            )
        self.num_envs = self.meta["lanes"]
        self.replan_freq = self.meta["replan_freq"]
        self.lang_embeddings = self._art.lang_embeddings
        self._rng = jax.random.key(seed)
        self._step = self._art.fn("step_batched")
        self._norm = self._art.norm

    def initial_state(self):
        e = self.num_envs
        return (
            _commit(jnp.zeros((e, self.meta["plan_dim"]), jnp.float32)),
            _commit(jnp.zeros((e, self.meta["latent_goal_features"]), jnp.float32)),
            _zero_carry(self.meta["carry"], e),
        )

    def warmup(self) -> None:
        """Compile the lockstep step before serving traffic."""
        saved_rng = self._rng
        obs = [self._art.zero_obs()] * self.num_envs
        embs = np.zeros((self.num_envs, self.meta["lang_dim"]), np.float32)
        self.step(obs, embs, self.initial_state(), np.ones((self.num_envs,), bool))
        self._rng = saved_rng

    def step(self, obs_batch, lang_embs: np.ndarray, state, replan_mask: np.ndarray):
        # The exported step is FIXED at lanes=E: pad an under-filled batch
        # (e.g. fewer eval chains than exported lanes) with the last obs and
        # return only the real lanes' actions. Filler lanes never replan, so
        # their plan/goal/carry stay zero and cost nothing semantically.
        n = len(obs_batch)
        e = self.num_envs
        if n > e:
            raise ValueError(f"got {n} lanes but the artifact was exported with lanes={e}")
        if n < e:
            obs_batch = list(obs_batch) + [obs_batch[-1]] * (e - n)
            lang_embs = np.concatenate(
                [np.asarray(lang_embs, np.float32),
                 np.zeros((e - n, np.asarray(lang_embs).shape[-1]), np.float32)]
            )
            replan_mask = np.concatenate(
                [np.asarray(replan_mask, bool), np.zeros((e - n,), bool)]
            )
        cams = self.meta["cameras"]
        rgb_static = (
            np.stack([np.asarray(o["rgb_obs"]["rgb_static"], np.uint8) for o in obs_batch])[:, None]
            if cams["rgb_static"] is not None
            else None
        )
        rgb_gripper = (
            np.stack([np.asarray(o["rgb_obs"]["rgb_gripper"], np.uint8) for o in obs_batch])[:, None]
            if cams["rgb_gripper"] is not None
            else None
        )
        rob_raw = np.stack([o["robot_obs"] for o in obs_batch]).astype(np.float32)[:, None]
        scene_raw = (
            np.stack([o["scene_obs"] for o in obs_batch]).astype(np.float32)[:, None]
            if self._norm.include_scene and "scene_obs" in obs_batch[0]
            else None
        )
        rob_norm = self._norm(rob_raw, scene_raw)
        self._rng, k = jax.random.split(self._rng)
        plan, goal, carry = state
        actions, plan, goal, carry = self._step(
            self.params, jax.random.key_data(k), rgb_static, rgb_gripper,
            rob_norm, rob_raw, jnp.asarray(lang_embs, jnp.float32),
            plan, goal, carry, jnp.asarray(replan_mask, bool),
        )
        return np.asarray(actions)[:n], (plan, goal, carry)
