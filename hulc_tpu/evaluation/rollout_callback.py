"""Training-time rollout evaluation callbacks.

Reference: calvin_agent.rollout.rollout_long_horizon.RolloutLongHorizon
(conf/callbacks/rollout_lh/default.yaml — 128 chains every val epoch,
skip_epochs 1, ep_len 360), which logs ``eval_lh/avg_seq_len`` — the metric
the best-checkpoint monitor tracks (conf/callbacks/checkpoint/lh_sr.yaml) —
and calvin_agent.rollout.rollout.Rollout (conf/callbacks/rollout/default.yaml,
ep_len 120, single instructions), which logs per-task SR + ``tasks/average_sr``
(monitor conf/callbacks/checkpoint/task_sr.yaml).
"""

from __future__ import annotations

import collections
from typing import Callable, Dict, Optional

from hulc_tpu.evaluation.lh_eval import evaluate_policy, get_sequences, rollout
from hulc_tpu.evaluation.policy import HulcPolicy
from hulc_tpu.evaluation.tasks import SceneObsTasks


class RolloutLongHorizonCallback:
    def __init__(
        self,
        env,
        oracle=None,
        num_sequences: int = 128,
        ep_len: int = 360,
        rollout_freq: int = 1,
        skip_epochs: int = 1,
        instructions: Optional[Dict[str, str]] = None,
        lang_embeddings: Optional[Dict] = None,
        statistics=None,
        seed: int = 0,
    ):
        self.env = env
        self.oracle = oracle or SceneObsTasks()
        self.num_sequences = num_sequences
        self.ep_len = ep_len
        self.rollout_freq = rollout_freq
        self.skip_epochs = skip_epochs
        self.instructions = instructions
        self.lang_embeddings = lang_embeddings
        self.statistics = statistics
        self.seed = seed
        self.best_avg_seq_len = -1.0

    def on_epoch_end(self, trainer, state, epoch: int) -> Optional[Dict[str, float]]:
        if epoch < self.skip_epochs or (epoch - self.skip_epochs) % self.rollout_freq != 0:
            return None
        from hulc_tpu.data.language import restrict_task_pool
        from hulc_tpu.evaluation.tasks import ALL_TASKS

        policy = HulcPolicy(
            trainer.cfg, state.params, statistics=self.statistics, seed=self.seed
        )
        pool = restrict_task_pool(self.lang_embeddings, ALL_TASKS)
        if self.lang_embeddings:
            policy.lang_embeddings = self.lang_embeddings
        else:
            import numpy as np

            policy.lang_embeddings = {
                t: np.zeros(trainer.cfg.lang_dim, np.float32) for t in ALL_TASKS
            }
        initial_states = None
        if set(pool) == set(ALL_TASKS):
            # feasibility-filtered protocol chains + matched scene resets
            from hulc_tpu.evaluation import chain_sampler

            pairs = chain_sampler.get_sequences(
                self.num_sequences, seed=self.seed + epoch
            )
            sequences = [chain for _, chain in pairs]
            initial_states = chain_sampler.resets_for_env(pairs, self.env)
        else:
            sequences = get_sequences(
                self.num_sequences, tasks=pool, seed=self.seed + epoch,
                chain_len=min(5, len(pool)),
            )
        results = evaluate_policy(
            policy,
            self.env,
            epoch=epoch,
            num_sequences=self.num_sequences,
            ep_len=self.ep_len,
            oracle=self.oracle,
            instructions=self.instructions,
            sequences=sequences,
            initial_states=initial_states,
            seed=self.seed + epoch,
        )
        r = results[str(epoch)]
        metrics = {"eval_lh/avg_seq_len": r["avg_seq_len"]}
        metrics.update({f"eval_lh/chain_sr_{k}": v for k, v in r["chain_sr"].items()})
        self.best_avg_seq_len = max(self.best_avg_seq_len, r["avg_seq_len"])
        trainer.logger.log(metrics, int(state.step), "rollout")
        print(f"[rollout] epoch {epoch}: avg_seq_len={r['avg_seq_len']:.3f}")
        return metrics


class RolloutCallback:
    """Short-horizon single-task rollouts logging per-task SR.

    Reference: calvin_agent.rollout.rollout.Rollout wired by
    conf/callbacks/rollout/default.yaml (ep_len 120, one instruction per
    rollout). Emits ``tasks/average_sr`` — the conf/callbacks/checkpoint/
    task_sr.yaml monitor — plus ``tasks/<task>_sr`` per attempted task.
    """

    def __init__(
        self,
        env,
        oracle=None,
        num_rollouts: int = 64,
        ep_len: int = 120,
        rollout_freq: int = 1,
        skip_epochs: int = 1,
        instructions: Optional[Dict[str, str]] = None,
        lang_embeddings: Optional[Dict] = None,
        statistics=None,
        seed: int = 0,
    ):
        self.env = env
        self.oracle = oracle or SceneObsTasks()
        self.num_rollouts = num_rollouts
        self.ep_len = ep_len
        self.rollout_freq = rollout_freq
        self.skip_epochs = skip_epochs
        self.instructions = instructions
        self.lang_embeddings = lang_embeddings
        self.statistics = statistics
        self.seed = seed

    def on_epoch_end(self, trainer, state, epoch: int) -> Optional[Dict[str, float]]:
        if epoch < self.skip_epochs or (epoch - self.skip_epochs) % self.rollout_freq != 0:
            return None
        import numpy as np

        from hulc_tpu.data.language import restrict_task_pool
        from hulc_tpu.evaluation.tasks import ALL_TASKS

        policy = HulcPolicy(
            trainer.cfg, state.params, statistics=self.statistics, seed=self.seed
        )
        pool = restrict_task_pool(self.lang_embeddings, ALL_TASKS)
        if self.lang_embeddings:
            policy.lang_embeddings = self.lang_embeddings
        else:
            policy.lang_embeddings = {
                t: np.zeros(trainer.cfg.lang_dim, np.float32) for t in ALL_TASKS
            }
        rng = np.random.default_rng(self.seed + epoch)
        attempts: Dict[str, int] = collections.defaultdict(int)
        successes: Dict[str, int] = collections.defaultdict(int)
        pool = list(pool)
        for i in range(self.num_rollouts):
            task = pool[i % len(pool)] if i < len(pool) else str(rng.choice(pool))
            self.env.reset()
            instruction = (self.instructions or {}).get(task, task)
            attempts[task] += 1
            if rollout(self.env, policy, task, instruction, self.oracle, self.ep_len):
                successes[task] += 1
        per_task = {f"tasks/{t}_sr": successes[t] / attempts[t] for t in sorted(attempts)}
        average = float(np.mean(list(per_task.values())))
        metrics = {"tasks/average_sr": average, **per_task}
        trainer.logger.log(metrics, int(state.step), "rollout")
        print(f"[rollout] epoch {epoch}: tasks/average_sr={average:.3f}")
        return metrics
