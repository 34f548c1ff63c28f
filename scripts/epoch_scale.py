"""Epoch-scale data-path rehearsal (VERDICT r3 #4).

The reference publishes 1.5 h/epoch over the 166 GB CALVIN D split on 8
GPUs with a ~20 min shm warm-up (reference README.md:70-76,85-86). This
script replaces our fixture-derived projection with a MEASUREMENT: generate
a multi-GB CALVIN-schema split, push the REAL loader -> preprocess -> device
path through a full epoch of windows (tens of thousands of sequences), and
record each stage's sustained rate plus the projected real-split epoch time.

Phases (each timed, all through production code paths):
  0. generate a synthetic npz split on disk (exact episode_*.npz schema)
  1. shm warm-up: EpisodeStore(cache="shm") populate from the npz files
     (the reference's 20-min ShmDataset warm-up equivalent)
  2. host-only epoch sweep: CombinedLoader iterates EVERY batch of one
     epoch (sampler + threaded gather + normalize at scale — the part that
     had only ever run on 4-episode fixtures)
  3. chip-fed run: loader -> shard_batch_tree -> jitted train step with
     echo=1 for --chip-steps steps (double-buffered), sustained e2e rate

Usage: python scripts/epoch_scale.py [--episodes 100] [--episode-len 384]
       [--chip-steps 150] [--cache shm] [--keep-data]
Writes EPOCH_SCALE.json at the repo root (or --out).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import time

import numpy as np

# reference split geometry for the projection: CALVIN D training split is
# ~512k frames / 166 GB (reference dataset/README.md:10-29); the reference
# epoch is ~16k optimizer steps at 32+32 per device over 8 GPUs
REAL_SPLIT_FRAMES = 512_000


def main(argv=None):
    from hulc_tpu.utils.tunnel import compact_tunnel_journal

    compact_tunnel_journal()  # epoch-scale H2D would be journal-retained; utils/tunnel.py

    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--episode-len", type=int, default=384)
    p.add_argument("--data-dir", default="/tmp/hulc_epoch_data")
    p.add_argument("--batch-size", type=int, default=32, help="per modality")
    p.add_argument("--min-window", type=int, default=20)
    p.add_argument("--max-window", type=int, default=32)
    p.add_argument("--cache", default="shm", choices=["shm", "ram"])
    p.add_argument("--chip-steps", type=int, default=150, help="0 skips the chip phase")
    p.add_argument("--host-batches", type=int, default=0,
                   help="cap host-sweep batches (0 = the full epoch)")
    p.add_argument("--keep-data", action="store_true")
    p.add_argument("--out", default="EPOCH_SCALE.json")
    args = p.parse_args(argv)

    from hulc_tpu.config import get_config
    from hulc_tpu.data.fixtures import write_split
    from hulc_tpu.data.loader import make_loaders

    root = pathlib.Path(args.data_dir)
    summary = {}

    # --- phase 0: multi-GB split on disk
    t0 = time.perf_counter()
    marker = root / "training" / "ep_start_end_ids.npy"
    n_frames = args.episodes * args.episode_len
    if marker.exists() and np.load(marker)[-1][1] + 1 >= n_frames:
        print(f"[epoch] reusing split at {root}")
        summary["generate_s"] = 0.0
    else:
        shutil.rmtree(root, ignore_errors=True)
        print(f"[epoch] generating {args.episodes}x{args.episode_len} frames at {root} ...",
              flush=True)
        write_split(root / "training", args.episodes, args.episode_len, seed=0,
                    small=False, with_lang=True, is_validation=False)
        write_split(root / "validation", 2, args.episode_len, seed=1,
                    small=False, with_lang=True, is_validation=True)
        summary["generate_s"] = round(time.perf_counter() - t0, 1)
    disk_gb = sum(f.stat().st_size for f in (root / "training").glob("episode_*.npz")) / 1e9
    summary["split_frames"] = n_frames
    summary["split_gb"] = round(disk_gb, 2)

    # --- phase 1: cache warm-up through the production EpisodeStore path
    cfg = get_config("hulc", compute_dtype="bfloat16")
    t0 = time.perf_counter()
    loader = make_loaders(
        cfg, root, split="training", batch_size=args.batch_size,
        min_window=args.min_window, max_window=args.max_window,
        cache=args.cache, fuse=True, num_workers=1,
    )
    warm_s = time.perf_counter() - t0
    steps_per_epoch = len(loader)
    seqs_per_step = 2 * args.batch_size
    epoch_seqs = steps_per_epoch * seqs_per_step
    summary["cache"] = args.cache
    summary["warmup_s"] = round(warm_s, 1)
    summary["warmup_mb_s"] = round(disk_gb * 1e3 / warm_s, 1)
    summary["steps_per_epoch"] = steps_per_epoch
    summary["epoch_seqs"] = epoch_seqs
    print(f"[epoch] warm-up {warm_s:.1f} s ({args.cache}); epoch = "
          f"{steps_per_epoch} steps x {seqs_per_step} seqs", flush=True)

    # --- phase 2: host-only full-epoch sweep (device idle)
    n_host = args.host_batches or steps_per_epoch
    it = iter(loader)
    first = next(it)  # pages/threads warm
    nbytes = sum(x.nbytes for x in first["fused"] if x is not None)
    t0 = time.perf_counter()
    done = 1
    for batch in it:
        done += 1
        if done >= n_host:
            break
        if done % 200 == 0:
            rate = done * seqs_per_step / (time.perf_counter() - t0)
            print(f"[epoch] host sweep {done}/{n_host} ({rate:.0f} seq/s)", flush=True)
    host_s = time.perf_counter() - t0
    host_seq_s = (done - 1) * seqs_per_step / host_s
    summary["host_sweep_batches"] = done
    summary["host_seq_s"] = round(host_seq_s, 1)
    summary["host_mb_s"] = round((done - 1) * nbytes / host_s / 1e6, 1)
    summary["host_epoch_s"] = round(epoch_seqs / host_seq_s, 1)
    print(f"[epoch] host-only: {host_seq_s:.0f} seq/s -> full epoch "
          f"{summary['host_epoch_s']:.0f} s", flush=True)

    # --- phase 3: chip-fed (echo=1, double-buffered) — measures what this
    # rig's wire actually sustains; a production host is device-bound here
    if args.chip_steps:
        import jax
        import jax.numpy as jnp

        from hulc_tpu.parallel.mesh import shard_batch_tree
        from hulc_tpu.training.trainer import Trainer, TrainerConfig

        trainer = Trainer(cfg, TrainerConfig(run_dir="/tmp/hulc_epoch_run", donate_state=True))
        state = trainer.init_state(first, steps_per_epoch=steps_per_epoch)
        step = trainer.make_train_step()
        kl = jnp.asarray(0.01)
        rng = jax.random.key(0)

        it = iter(loader)
        cur = shard_batch_tree(next(it), trainer.mesh)
        state, losses = step(state, cur, rng, kl)
        _ = float(losses["total_loss"])  # compile + hard sync
        n_chip = min(args.chip_steps, steps_per_epoch - 1)
        cur = shard_batch_tree(next(it), trainer.mesh)
        t0 = time.perf_counter()
        for i in range(n_chip):
            nxt = shard_batch_tree(next(it), trainer.mesh) if i < n_chip - 1 else None
            state, losses = step(state, cur, rng, kl)
            cur = nxt
        _ = float(losses["total_loss"])
        chip_s = time.perf_counter() - t0
        chip_seq_s = n_chip * seqs_per_step / chip_s
        summary["chip_steps"] = n_chip
        summary["chip_seq_s"] = round(chip_seq_s, 1)
        summary["chip_epoch_s_this_rig"] = round(epoch_seqs / chip_seq_s, 1)
        summary["final_total_loss"] = round(float(losses["total_loss"]), 3)
        print(f"[epoch] chip-fed: {chip_seq_s:.0f} seq/s -> full epoch "
              f"{summary['chip_epoch_s_this_rig']:.0f} s on this rig", flush=True)

        # projections: a production host feeds at >= the measured host rate
        # while the device computes — slowest stage wins
        summary["real_split_epoch_proj"] = {
            "frames": REAL_SPLIT_FRAMES,
            "epoch_seqs": REAL_SPLIT_FRAMES // args.batch_size * seqs_per_step,
            "host_bound_s": round(
                REAL_SPLIT_FRAMES // args.batch_size * seqs_per_step / host_seq_s, 1
            ),
            "this_rig_wire_bound_s": round(
                REAL_SPLIT_FRAMES // args.batch_size * seqs_per_step / chip_seq_s, 1
            ),
        }

    print("[epoch] " + json.dumps(summary))
    pathlib.Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    if not args.keep_data:
        shutil.rmtree(root, ignore_errors=True)
    return summary


if __name__ == "__main__":
    main()
