"""Headline benchmark: HULC train-step throughput (sequences/sec/chip).

Measures the full jitted optimizer step (on-device uint8 preprocessing +
augmentation + forward + backward + adam) on the flagship HULC config at the
reference's per-device load: 32 vision + 32 language sequences, 32-frame
windows, 200px + 84px cameras.

Baseline derivation (BASELINE.md): the reference trains at 1.5 h/epoch on
8x RTX 2080Ti with effective batch 512 (64 seq/GPU/step). The CALVIN D
training split has ~512k frames -> ~16k steps/epoch -> ~0.34 s/step ->
~188 seq/s for 8 GPUs = ~23.5 seq/s per GPU. vs_baseline is measured
seq/s/chip divided by that per-GPU figure.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")

BASELINE_SEQ_PER_SEC_PER_GPU = 23.5


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import get_config
    from hulc_tpu.parallel.mesh import make_mesh, shard_batch_tree
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    batch_per_mod = 32  # per chip (the reference's per-device load)
    seq_len = 32
    cfg = get_config("hulc", compute_dtype="bfloat16")
    tcfg = TrainerConfig(run_dir="/tmp/hulc_bench", donate_state=True)
    trainer = Trainer(cfg, tcfg)
    n_chips = len(trainer.mesh.devices.flat)

    # GLOBAL batch scales with the mesh so each chip really processes
    # 32+32 sequences per step (the sharded batch divides by n_chips)
    raw = _make_raw_batch(cfg, batch_per_mod * n_chips, seq_len, 200, 84)
    # param shapes don't depend on batch/seq size: init on a tiny batch to
    # keep the (uncached) init compile cheap
    tiny = _make_raw_batch(cfg, 2, 8, 200, 84)
    state = trainer.init_state(tiny, steps_per_epoch=1)
    train_step = trainer.make_train_step()
    kl_beta = jnp.asarray(0.01)
    rng = jax.random.key(0)

    sharded = shard_batch_tree(raw, trainer.mesh)
    # compile + warmup; the float() fetch matters: on remote-compile
    # platforms the scalar D2H transfer is itself a compiled program, and
    # block_until_ready alone would leave it to stall the first timed step
    state, losses = train_step(state, sharded, rng, kl_beta)
    _ = float(losses["total_loss"])

    seqs_per_step = 2 * batch_per_mod * n_chips
    # Pipelined steady-state timing (how the trainer actually runs: steps are
    # dispatched async, losses fetched only at log points). A single hard
    # sync at the end bounds the whole pipeline. On tunneled runtimes a
    # per-step scalar fetch would add ~30 ms RTT that real training never pays.
    steps = 20
    t0 = time.perf_counter()
    for i in range(steps):
        state, losses = train_step(state, sharded, rng, kl_beta)
    _ = float(losses["total_loss"])
    step_time = (time.perf_counter() - t0) / steps
    seq_per_sec_per_chip = seqs_per_step / step_time / n_chips

    print(
        json.dumps(
            {
                "metric": "hulc_train_seq_per_sec_per_chip",
                "value": round(seq_per_sec_per_chip, 2),
                "unit": "seq/s/chip (32vis+32lang, S=32, bf16, full train step)",
                "vs_baseline": round(seq_per_sec_per_chip / BASELINE_SEQ_PER_SEC_PER_GPU, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
