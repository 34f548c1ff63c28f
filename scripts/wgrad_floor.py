"""Extend the HBM-floor proof to the conv-tower weight gradients (VERDICT r4 #8).

The ~20.4 ms bench step runs at ~93% of the 819 GB/s HBM roofline; its two
largest remaining byte pools are the relayout-copy family (floor-proven in
round 3) and the conv0-2 weight gradients of the camera towers (~3.8 ms by
round-3 profile attribution; reference towers:
hulc/models/perceptual_encoders/vision_network.py 8/4-4/2-3/1 convs,
vision_network_gripper.py nature_cnn). This script decides whether those
milliseconds are bandwidth-floored or XLA inefficiency.

Method (the round-2/3 profiling recipe — measure INSIDE the one compiled
program): build the exact bench-shape train step, profile a few steps with
jax.profiler, aggregate per-op device durations from the xplane "XLA Ops"
line, then resolve every convolution instruction's operand/output shapes
from the compiled HLO text. Each conv op gets:

    floor_ms = sum(operand bytes + output bytes) / 819 GB/s
    class    = wgrad  if its output shape is a kernel shape
               fwd/dgrad otherwise

NOTE an earlier version measured each wgrad as its own jitted program and
got ~3 ms/op regardless of size: on the tunneled runtime a standalone
dispatch has a ~3 ms host-side floor, so op-level truth is only visible
inside one compiled program (same reason bench.py times pipelined loops).

Writes WGRAD_FLOOR.json at the repo root.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import pathlib
import re
import shutil
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

HBM_PEAK_GBS = 819.0
TRACE_DIR = "/tmp/hulc_wgrad_trace"

DTYPE_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "u8": 1, "s8": 1, "f64": 8, "s64": 8, "u64": 8}

# a convolution whose OUTPUT is kernel-sized is a weight gradient; the
# compiler may permute the kernel layout, so classify by element count —
# tower kernels are <= 36,864 elements while every activation-producing
# conv in the step carries the 2048-frame batch (>= 6M elements)
WGRAD_MAX_OUT_ELEMS = 100_000

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def parse_shape(type_str):
    """'bf16[2048,49,49,32]{3,2,1,0}' -> (dtype, (2048,49,49,32))."""
    m = _SHAPE_RE.search(type_str)
    if not m:
        return None
    dt = m.group(1)
    dims = tuple(int(d) for d in m.group(2).split(",")) if m.group(2) else ()
    return dt, dims


def _prod(dims):
    n = 1
    for d in dims:
        n *= d
    return n


def shape_bytes(dt_dims):
    dt, dims = dt_dims
    n = 1
    for d in dims:
        n *= d
    return n * DTYPE_BYTES.get(dt, 4)


def parse_hlo_convs(hlo_text):
    """name -> {out, operands, raw} for every convolution instruction.

    HLO text lines look like:
      %convolution.123 = bf16[8,2,12,32]{...} convolution(%fusion.1, %x.2), window=...
    Operand shapes come from each operand's own defining line.
    """
    defs = {}
    for m in re.finditer(r"%([\w.\-]+) = (\w+\[[\d,]*\])", hlo_text):
        defs[m.group(1)] = parse_shape(m.group(2))
    convs = {}
    for m in re.finditer(
        r"%([\w.\-]+) = (\w+\[[\d,]*\])[^\n]*? convolution\(([^)]*)\)", hlo_text
    ):
        name, out_t, args = m.group(1), m.group(2), m.group(3)
        operands = []
        for om in re.finditer(r"%([\w.\-]+)", args):
            sh = defs.get(om.group(1))
            if sh is not None:
                operands.append(sh)
        convs[name] = {"out": parse_shape(out_t), "operands": operands}
    return convs


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=32, help="per-modality (bench: 32)")
    p.add_argument("--seq", type=int, default=32)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--out", default="WGRAD_FLOOR.json")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_raw_batch
    from hulc_tpu.config import get_config
    from hulc_tpu.data.loader import CombinedLoader
    from hulc_tpu.parallel.mesh import shard_batch_tree
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    cfg = get_config("hulc", compute_dtype="bfloat16")
    trainer = Trainer(cfg, TrainerConfig(run_dir="/tmp/hulc_wgrad_run", donate_state=True))
    raw = CombinedLoader.fuse_batch(_make_raw_batch(cfg, args.batch, args.seq))
    tiny = _make_raw_batch(cfg, 2, 8)
    state = trainer.init_state(tiny, steps_per_epoch=1)
    step = trainer.make_train_step()
    sharded = shard_batch_tree(raw, trainer.mesh)
    rng = jax.random.key(0)
    kl = jnp.asarray(0.01)

    lowered = step.lower(state, sharded, rng, kl)
    compiled = lowered.compile()
    convs = parse_hlo_convs(compiled.as_text())
    print(f"[wgrad-floor] {len(convs)} convolution instructions in the step HLO")

    state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])  # warm compile + D2H sync program
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])
    step_ms = (time.perf_counter() - t0) / args.steps * 1e3
    print(f"[wgrad-floor] steady-state step: {step_ms:.2f} ms")

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    for _ in range(args.steps):
        state, losses = step(state, sharded, rng, kl)
    _ = float(losses["total_loss"])
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True))
    xs = xplane_pb2.XSpace()
    with open(files[-1], "rb") as fh:
        xs.ParseFromString(fh.read())
    plane = next((pl for pl in xs.planes if "TPU" in pl.name), None)
    if plane is None:
        raise SystemExit(f"no TPU plane (planes: {[pl.name for pl in xs.planes]})")
    meta = {m.id: m.name for m in plane.event_metadata.values()}
    agg = defaultdict(float)
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            agg[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9 / args.steps

    rows, unmatched_conv_ms = [], 0.0
    for op_name, ms in agg.items():
        key = op_name.lstrip("%")
        if key not in convs:
            if "convolution" in op_name:
                unmatched_conv_ms += ms
            continue
        info = convs[key]
        nbytes = shape_bytes(info["out"]) + sum(shape_bytes(o) for o in info["operands"])
        floor = nbytes / (HBM_PEAK_GBS * 1e9) * 1e3
        rows.append({
            "op": key,
            "class": (
                "wgrad"
                if _prod(info["out"][1]) <= WGRAD_MAX_OUT_ELEMS
                else "fwd/dgrad"
            ),
            "out_shape": list(info["out"][1]),
            "ms": round(ms, 3),
            "bytes_mb": round(nbytes / 1e6, 1),
            "floor_ms": round(floor, 3),
            "pct_of_floor": round(100.0 * floor / ms, 1) if ms > 0 else None,
        })
    rows.sort(key=lambda r: -r["ms"])
    wg = [r for r in rows if r["class"] == "wgrad"]
    doc = {
        "shape": f"{args.batch}+{args.batch} fused, S={args.seq}, bf16",
        "device": str(jax.devices()[0]),
        "hbm_peak_gb_s": HBM_PEAK_GBS,
        "step_ms": round(step_ms, 2),
        "conv_ops": rows,
        "wgrad_total_ms": round(sum(r["ms"] for r in wg), 3),
        "wgrad_floor_total_ms": round(sum(r["floor_ms"] for r in wg), 3),
        "wgrad_pct_of_floor": round(
            100.0 * sum(r["floor_ms"] for r in wg) / max(sum(r["ms"] for r in wg), 1e-9), 1
        ),
        "unmatched_conv_ms": round(unmatched_conv_ms, 3),
        "method": "per-op device durations from the xplane trace of the real "
                  "train step; bytes from the compiled HLO operand/output "
                  "shapes; standalone-dispatch isolation is invalid on the "
                  "tunneled runtime (~3 ms host floor per dispatch)",
    }
    pathlib.Path(args.out).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps({k: v for k, v in doc.items() if k != "conv_ops"}, indent=1))
    for r in rows[:12]:
        print(f"  {r['ms']:7.3f} ms {r['class']:9s} out={r['out_shape']} "
              f"bytes={r['bytes_mb']} MB floor={r['floor_ms']} ms "
              f"({r['pct_of_floor']}% of floor) {r['op'][:60]}")


if __name__ == "__main__":
    main()
