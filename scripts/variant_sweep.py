"""Full-size train-step sweep over every model-family config (real chip).

For each registered config, builds the trainer, synthesizes a config-shaped
uint8 batch (loader-fused schema, the training default), and times the jitted
train step pipelined over many iterations with ONE final D2H fetch — on
tunneled runtimes a per-step (or per-few-steps) scalar fetch adds the ~30 ms
RTT to the measurement, which is how the round-2 sweep over-reported variant
steps (e.g. tactile "93 ms" was ~6.6 ms device + RTT + cold noise).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/variant_sweep.py \
        [--batch 8] [--seq 16] [--steps 30] [--configs hulc,mcil,...]

Prints a markdown table (README "model families" section) and asserts every
variant's loss is finite.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")

DEFAULT_CONFIGS = (
    "hulc",
    "mcil",
    "gcbc",
    "hulc_deterministic",
    "hulc_depth",
    "hulc_tactile",
    "hulc_clip_vision",
    "hulc_clip_lang",
)


def sweep_one(name: str, batch: int, seq: int, steps: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import get_config
    from hulc_tpu.data.loader import CombinedLoader
    from hulc_tpu.parallel.mesh import shard_batch_tree
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    cfg = get_config(name, compute_dtype="bfloat16")
    trainer = Trainer(cfg, TrainerConfig(run_dir=f"/tmp/hulc_sweep_{name}", donate_state=True))
    raw = CombinedLoader.fuse_batch(_make_raw_batch(cfg, batch, seq))
    tiny = _make_raw_batch(cfg, 2, 8)
    state = trainer.init_state(tiny, steps_per_epoch=1)
    step = trainer.make_train_step()
    sharded = shard_batch_tree(raw, trainer.mesh)
    rng = jax.random.key(0)
    kl = jnp.asarray(0.01)

    import numpy as np

    state, losses = step(state, sharded, rng, kl)
    total = float(losses["total_loss"])  # warm + real sync
    assert np.isfinite(total), f"{name}: non-finite warmup loss {total}"

    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = step(state, sharded, rng, kl)
    total = float(losses["total_loss"])
    step_ms = (time.perf_counter() - t0) / steps * 1e3
    assert np.isfinite(total), f"{name}: non-finite loss after {steps} steps: {total}"
    seq_s = 2 * batch / (step_ms / 1e3)
    return step_ms, seq_s, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8, help="per-modality batch size")
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30, help="timed steps (pipelined, one final fetch)")
    ap.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    args = ap.parse_args(argv)

    rows = []
    for name in args.configs.split(","):
        name = name.strip()
        try:
            step_ms, seq_s, total = sweep_one(name, args.batch, args.seq, args.steps)
            rows.append((name, step_ms, seq_s, total))
            print(f"[sweep] {name}: {step_ms:.1f} ms/step  {seq_s:.0f} seq/s  loss={total:.2f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            rows.append((name, None, None, None))
            print(f"[sweep] {name}: FAILED {exc!r}", flush=True)

    print(f"\n| config | step ms (B={args.batch}+{args.batch}, S={args.seq}) | seq/s | loss finite |")
    print("|---|---|---|---|")
    for name, step_ms, seq_s, total in rows:
        if step_ms is None:
            print(f"| {name} | FAILED | — | — |")
        else:
            print(f"| {name} | {step_ms:.1f} | {seq_s:.0f} | yes |")
    if any(r[1] is None for r in rows):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
