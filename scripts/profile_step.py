"""Op-level TPU profile of the train step (the round-2 perf workflow).

Captures a jax.profiler trace of N train steps and prints the top XLA ops
by device time, aggregated from the xplane proto — no TensorBoard needed.
This is the exact loop used to find the round-2 wins (f32 normalize chain,
conv0 space-to-depth, SpatialSoftmax transposes, relu JVP masks).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_step.py \
        [--config hulc] [--batch 32] [--seq 32] [--steps 5] [--top 30]

NOTE (tunneled runtimes): block_until_ready does NOT actually synchronize —
only a D2H fetch does. All timing here fetches a scalar to sync.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")
# xplane_pb2 ships inside tensorflow; its generated protos need the pure-
# python protobuf implementation with the installed protobuf version
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = "/tmp/hulc_profile_trace"


def capture(config: str, batch: int, seq: int, steps: int) -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import get_config
    from hulc_tpu.parallel.mesh import shard_batch_tree
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    cfg = get_config(config, compute_dtype="bfloat16")
    trainer = Trainer(cfg, TrainerConfig(run_dir="/tmp/hulc_profile_run", donate_state=True))
    pe = cfg.perceptual_encoder
    from hulc_tpu.data.loader import CombinedLoader

    # fused schema = the training default (loader-side [vis; lang] stacking)
    raw = CombinedLoader.fuse_batch(_make_raw_batch(cfg, batch, seq))
    tiny = _make_raw_batch(cfg, 2, 8)
    state = trainer.init_state(tiny, steps_per_epoch=1)
    step = trainer.make_train_step()
    sharded = shard_batch_tree(raw, trainer.mesh)
    rng = jax.random.key(0)
    kl = jnp.asarray(0.01)

    state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])  # warm + true sync (see module docstring)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])
    print(f"[profile] steady-state step: {(time.perf_counter() - t0) / steps * 1e3:.2f} ms")

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(steps):
        state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])
    jax.profiler.stop_trace()


def report(steps: int, top: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True))
    if not files:
        sys.exit("no xplane trace found")
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    plane = next((p for p in xs.planes if "TPU" in p.name), None)
    if plane is None:
        sys.exit(f"no TPU plane in trace (planes: {[p.name for p in xs.planes]})")
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg: dict = defaultdict(float)
    cnt: dict = defaultdict(int)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = meta.get(ev.metadata_id, "?")
            agg[name] += ev.duration_ps / 1e9 / steps
            cnt[name] += 1
    total = sum(agg.values())
    print(f"[profile] {total:.2f} ms/step across {len(agg)} distinct ops; top {top}:")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {ms:7.3f} ms x{cnt[name] // steps:<4d} {name[:120]}")

    # roofline-style class split (VERDICT r3 #2): group op time by HLO kind.
    # convolution/dot ride the MXU; copy/transpose/bitcast are pure HBM
    # relayout traffic; while = the RNN scan loops; fusion = fused
    # elementwise+matmul bodies (mixed — XLA names conv/dot roots by their
    # own kind, so "fusion" here is predominantly elementwise/HBM-bound).
    classes = {
        "conv (MXU)": ("convolution",),
        "matmul (MXU)": ("dot",),
        "relayout/copy (HBM)": ("copy", "transpose", "bitcast"),
        "rnn while-loops": ("while",),
        "fused elementwise (mostly HBM)": ("fusion",),
        "collectives": ("all-reduce", "all-gather", "reduce-scatter", "collective"),
    }
    by_class = defaultdict(float)
    for name, ms in agg.items():
        base = name.split(".")[0].lstrip("%")
        for cls, prefixes in classes.items():
            if any(base.startswith(p) for p in prefixes):
                by_class[cls] += ms
                break
        else:
            by_class["other"] += ms
    print(f"[roofline] {total:.2f} ms/step by op class:")
    for cls, ms in sorted(by_class.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:7.3f} ms ({ms / total * 100:4.1f}%)  {cls}")


def main(argv=None):
    ap = argparse.ArgumentParser(description="op-level TPU profile of the train step")
    ap.add_argument("--config", default="hulc")
    ap.add_argument("--batch", type=int, default=32, help="per-modality batch size")
    ap.add_argument("--seq", type=int, default=32)
    ap.add_argument("--steps", type=int, default=5, help="traced steps")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--report-only", action="store_true", help="parse an existing trace")
    args = ap.parse_args(argv)
    if not args.report_only:
        capture(args.config, args.batch, args.seq, args.steps)
    report(args.steps, args.top)


if __name__ == "__main__":
    main()
