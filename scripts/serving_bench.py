"""Closed-loop serving benchmark: live policy vs exported StableHLO artifact.

Measures what a deployment actually sees — per-step latency of the
reset()/step() contract (single lane) and lockstep throughput across E
lanes — for both the live flax policy (evaluation/policy.py) and the
model-code-free ServedPolicy reloaded from a serving artifact
(serving/runtime.py). The reference has no comparable path; its eval loop
re-instantiates the Lightning training class per run
(/root/reference/hulc/evaluation/evaluate_policy.py:163-186).

Timing is honest closed-loop: the policy state machine lives on the host,
so each step pays one device dispatch. On this rig that includes the
~30 ms tunnel RTT per dispatch (see CLAUDE.md); on a production host with
a local chip the dispatch overhead is tens of microseconds. Batched lanes
amortize the dispatch, which is why lanes-throughput is the
deployment-relevant number here.

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/serving_bench.py \
        [--config hulc] [--steps 60] [--lanes 8] [--out /tmp/hulc_artifact]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")


def _time_single(policy, obs, goal, steps: int) -> float:
    """Steady-state seconds/step of the reset/step contract (excludes the
    first post-reset step, which pays the replan compile/dispatch)."""
    policy.reset()
    policy.step(obs, goal)  # warm (compile on first use)
    t0 = time.perf_counter()
    for _ in range(steps):
        policy.step(obs, goal)
    return (time.perf_counter() - t0) / steps


def _time_batched(policy, obs_batch, embs, steps: int) -> float:
    import numpy as np

    state = policy.initial_state()
    replan = np.ones((len(obs_batch),), bool)
    _, state = policy.step(obs_batch, embs, state, replan)  # warm
    no_replan = np.zeros((len(obs_batch),), bool)
    t0 = time.perf_counter()
    for _ in range(steps):
        actions, state = policy.step(obs_batch, embs, state, no_replan)
    float(np.asarray(actions)[0, 0])  # sync
    return (time.perf_counter() - t0) / steps


def run(config: str, steps: int, lanes: int, out: str, seed: int = 0):
    import jax
    import numpy as np

    from hulc_tpu.config import get_config
    from hulc_tpu.evaluation.batched_eval import BatchedHulcPolicy
    from hulc_tpu.evaluation.fake_env import fake_env_for
    from hulc_tpu.evaluation.policy import HulcPolicy
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.serving import ServedBatchedPolicy, ServedPolicy, export_policy

    cfg = get_config(config)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(seed), batch)
    emb = {"bench_task": np.random.default_rng(1).normal(size=cfg.lang_dim).astype(np.float32)}

    t0 = time.perf_counter()
    export_policy(cfg, params, out, lang_embeddings=emb, lanes=lanes)
    export_s = time.perf_counter() - t0

    env = fake_env_for(cfg)
    obs = env.reset()
    rows = []

    live = HulcPolicy(cfg, params, lang_embeddings=emb, seed=seed)
    rows.append(("live single-lane", _time_single(live, obs, "bench_task", steps)))
    served = ServedPolicy(out, seed=seed)
    rows.append(("served single-lane", _time_single(served, obs, "bench_task", steps)))

    obs_batch = [obs] * lanes
    embs = np.stack([emb["bench_task"]] * lanes)
    live_b = BatchedHulcPolicy(cfg, params, lanes, seed=seed)
    rows.append((f"live {lanes}-lane", _time_batched(live_b, obs_batch, embs, steps) / lanes))
    served_b = ServedBatchedPolicy(out, seed=seed)
    rows.append((f"served {lanes}-lane", _time_batched(served_b, obs_batch, embs, steps) / lanes))

    print(f"\nconfig={config} backend={jax.default_backend()} "
          f"steps={steps} lanes={lanes} export={export_s:.1f}s")
    print(f"{'mode':<22}{'ms/policy-step':>16}{'steps/s':>12}")
    for name, s in rows:
        print(f"{name:<22}{s * 1e3:>16.2f}{1.0 / s:>12.1f}")
    return {name: 1.0 / s for name, s in rows}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", default="hulc")
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--lanes", type=int, default=8)
    p.add_argument("--out", default="/tmp/hulc_serving_artifact")
    args = p.parse_args(argv)
    run(args.config, args.steps, args.lanes, args.out)


if __name__ == "__main__":
    main()
