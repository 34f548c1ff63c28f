"""Receipts-driven step experiments on the HBM-bound train step (VERDICT r3 #6).

bench.py's roofline block shows the 21 ms bench step runs at ~94% of HBM
peak but only ~23% MXU — the step is bandwidth-bound, so the remaining
levers cut BYTES, not FLOPs. This script measures the two byte-cutting
knobs one at a time against the baseline, at the exact bench shape
(32 vis + 32 lang fused, S=32, bf16, full train step):

  * remat       — perceptual_encoder.remat=true: recompute the conv towers
                  in the bwd instead of storing their intermediates
                  (trades MXU idle time for HBM traffic)
  * bf16mv      — TrainerConfig.adam_mv_dtype="bfloat16": adam moments
                  stored bf16, computed f32 (halves optimizer-state bytes)
  * remat+bf16mv

For each variant: compiled-executable cost-analysis bytes/flops, then the
median-of-3 pipelined step time (one hard sync per rep — per-step fetches
would add tunnel RTT). Writes STEP_EXPERIMENTS.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")


def measure(cfg, tcfg_kwargs, raw_fused, steps, reps=3):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.parallel.mesh import shard_batch_tree
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    trainer = Trainer(cfg, TrainerConfig(run_dir="/tmp/hulc_stepexp", donate_state=True,
                                         **tcfg_kwargs))
    tiny = _make_raw_batch(cfg, 2, 8, 200, 84)
    state = trainer.init_state(tiny, steps_per_epoch=1)
    step = trainer.make_train_step()
    kl = jnp.asarray(0.01)
    rng = jax.random.key(0)
    sharded = shard_batch_tree(raw_fused, trainer.mesh)

    lowered = step.lower(state, sharded, rng, kl).compile()
    ca = lowered.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops_g = float(ca.get("flops", 0.0)) / 1e9
    bytes_mb = float(ca.get("bytes accessed", 0.0)) / 1e6

    state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])  # compile via cache + warm the D2H program
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, losses = step(state, sharded, rng, kl)
        _ = float(losses["total_loss"])
        times.append((time.perf_counter() - t0) / steps)
    return {
        "step_ms": round(sorted(times)[len(times) // 2] * 1e3, 2),
        "step_ms_all": [round(t * 1e3, 2) for t in times],
        "flops_g": round(flops_g, 1),
        "hbm_bytes_mb": round(bytes_mb, 1),
        "loss": round(float(losses["total_loss"]), 4),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-per-mod", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=32)
    p.add_argument("--variants", default="baseline,remat,bf16mv,remat_bf16mv")
    p.add_argument("--out", default="STEP_EXPERIMENTS.json")
    args = p.parse_args(argv)

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import apply_overrides, get_config
    from hulc_tpu.data.loader import CombinedLoader

    base = get_config("hulc", compute_dtype="bfloat16")
    remat = apply_overrides(get_config("hulc", compute_dtype="bfloat16"),
                            ["perceptual_encoder.remat=true"])
    grid = {
        "baseline": (base, {}),
        "remat": (remat, {}),
        "bf16mv": (base, {"adam_mv_dtype": "bfloat16"}),
        "remat_bf16mv": (remat, {"adam_mv_dtype": "bfloat16"}),
    }
    raw = CombinedLoader.fuse_batch(
        _make_raw_batch(base, args.batch_per_mod, args.seq_len, 200, 84)
    )
    results = {}
    for name in args.variants.split(","):
        cfg, kw = grid[name]
        results[name] = measure(cfg, kw, raw, args.steps)
        print(f"[stepexp] {name}: {json.dumps(results[name])}", flush=True)

    if "baseline" in results:
        b = results["baseline"]
        for name, r in results.items():
            r["vs_baseline_ms"] = round(r["step_ms"] - b["step_ms"], 2)
            r["hbm_bytes_saved_mb"] = round(b["hbm_bytes_mb"] - r["hbm_bytes_mb"], 1)
    print("[stepexp] " + json.dumps(results))
    pathlib.Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    return results


if __name__ == "__main__":
    main()
