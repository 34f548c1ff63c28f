"""Extend the HBM-floor proof to the conv-tower weight gradients (VERDICT r4 #8).

Round-3 profiling attributed ~3.8 ms of the ~20.4 ms bench step to the
conv0-2 weight gradients of the two camera towers (reference towers:
hulc/models/perceptual_encoders/vision_network.py 8/4-4/2-3/1 convs,
vision_network_gripper.py nature_cnn). The step as a whole runs at ~93% of
the 819 GB/s HBM roofline, so the question for the wgrad family is whether
those 3.8 ms are themselves bandwidth-floored or XLA inefficiency.

Method: isolate each tower conv's weight gradient as its own jitted
program at the exact bench shape (B = 64 seqs x 32 frames = 2048 frames,
bf16, width-only space-to-depth conv0 exactly as the model computes it),
time it pipelined (one hard D2H sync per rep — per-step fetches add
~30 ms tunnel RTT each), and compare against its minimal HBM byte floor:

    floor_ms = (bytes(activation) + bytes(output grad) + bytes(wgrad)) / 819 GB/s

The MXU floor for these ops is ~0.3 ms each (60-70 GFLOP at bf16 peak) —
bandwidth dominates, as in the full step. A family that matches its
isolated floor AND whose isolated sum matches the in-step attribution is
at speed-of-light; headroom would show up as isolated-time >> floor or
in-step >> isolated (scheduling/fusion loss).

Writes WGRAD_FLOOR.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/hulc_jax_cache")

HBM_PEAK_GBS = 819.0


def conv_cases(n_frames: int):
    """(name, activation shape NHWC, kernel shape HWIO, strides) at bench shape.

    conv0 is measured in its space-to-depth form — (8,8,3,32) regrouped to
    (8,2,12,32) over a width-blocked input, stride (4,1) — because that is
    the op the train step actually runs (models/vision.py::SpaceToDepthConv).
    """
    cases = []
    # static tower: 200x200x3 -> s2d-w (200, 50, 12)
    cases.append(("static.conv0_s2dw", (n_frames, 200, 50, 12), (8, 2, 12, 32), (4, 1)))
    cases.append(("static.conv1", (n_frames, 49, 49, 32), (4, 4, 32, 64), (2, 2)))
    cases.append(("static.conv2", (n_frames, 23, 23, 64), (3, 3, 64, 64), (1, 1)))
    # gripper tower: 84x84x3 -> s2d-w (84, 21, 12)
    cases.append(("gripper.conv0_s2dw", (n_frames, 84, 21, 12), (8, 2, 12, 32), (4, 1)))
    cases.append(("gripper.conv1", (n_frames, 20, 20, 32), (4, 4, 32, 64), (2, 2)))
    cases.append(("gripper.conv2", (n_frames, 9, 9, 64), (3, 3, 64, 64), (1, 1)))
    return cases


def out_shape(a, k, s):
    n, h, w, _ = a
    kh, kw, _, f = k
    return (n, (h - kh) // s[0] + 1, (w - kw) // s[1] + 1, f)


def measure_case(name, a_shape, k_shape, strides, reps):
    import jax
    import jax.numpy as jnp

    g_shape = out_shape(a_shape, k_shape, strides)
    key = jax.random.key(0)
    ka, kg = jax.random.split(key)
    a = jax.random.normal(ka, a_shape, jnp.bfloat16)
    g = jax.random.normal(kg, g_shape, jnp.bfloat16)
    w0 = jnp.zeros(k_shape, jnp.bfloat16)

    def loss(w, a, g):
        y = jax.lax.conv_general_dilated(
            a, w, strides, "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        # contract against the (fixed) upstream grad: d/dw is EXACTLY the
        # train step's wgrad for this conv — same operands, same contraction
        return jnp.sum((y * g).astype(jnp.float32))

    # jax.grad discards the primal, and loss is linear in w, so the forward
    # conv is dead code — XLA DCEs it and the compiled program is the wgrad
    # op alone. Verified via cost_analysis: compiled flops must match the
    # wgrad contraction (within 2x), not fwd+wgrad.
    wgrad = jax.jit(jax.grad(loss))
    compiled = wgrad.lower(w0, a, g).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    compiled_gflop = float(ca.get("flops", 0.0)) / 1e9
    out = wgrad(w0, a, g)
    _ = jax.block_until_ready(out)
    _ = float(jnp.sum(out.astype(jnp.float32)))  # warm the D2H sync program

    times = []
    steps = max(1, reps)
    inner = 10
    for _ in range(steps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = wgrad(w0, a, g)
        _ = float(jnp.sum(out.astype(jnp.float32)))  # one hard sync
        times.append((time.perf_counter() - t0) / inner)
    times.sort()
    t_ms = times[len(times) // 2] * 1e3

    nbytes = (
        int(jnp.prod(jnp.array(a_shape))) * 2
        + int(jnp.prod(jnp.array(g_shape))) * 2
        + int(jnp.prod(jnp.array(k_shape))) * 2
    )
    floor_ms = nbytes / (HBM_PEAK_GBS * 1e9) * 1e3
    kh, kw, ci, co = k_shape
    n, ho, wo, _ = g_shape
    gflop = 2.0 * n * ho * wo * kh * kw * ci * co / 1e9
    return {
        "case": name,
        "a_shape": list(a_shape),
        "g_shape": list(g_shape),
        "k_shape": list(k_shape),
        "ms": round(t_ms, 3),
        "floor_ms": round(floor_ms, 3),
        "pct_of_floor": round(100.0 * floor_ms / t_ms, 1) if t_ms else None,
        "achieved_gb_s": round(nbytes / (t_ms / 1e3) / 1e9, 1) if t_ms else None,
        "gflop": round(gflop, 1),
        "compiled_gflop": round(compiled_gflop, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--frames", type=int, default=2048,
                   help="frame batch (bench: 64 seqs x window 32)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out", default="WGRAD_FLOOR.json")
    args = p.parse_args(argv)

    import jax

    rows = [
        measure_case(name, a, k, s, args.reps)
        for name, a, k, s in conv_cases(args.frames)
    ]
    total_ms = round(sum(r["ms"] for r in rows), 3)
    total_floor = round(sum(r["floor_ms"] for r in rows), 3)
    doc = {
        "frames": args.frames,
        "device": str(jax.devices()[0]),
        "hbm_peak_gb_s": HBM_PEAK_GBS,
        "cases": rows,
        "isolated_total_ms": total_ms,
        "byte_floor_total_ms": total_floor,
        "pct_of_floor_total": round(100.0 * total_floor / total_ms, 1),
        "in_step_attribution_ms": 3.8,
        "note": (
            "in_step_attribution_ms is the round-3 profile attribution of the "
            "conv wgrad family inside the full bench step; isolated_total vs "
            "that number separates op-level efficiency from scheduling/fusion "
            "effects"
        ),
    }
    pathlib.Path(args.out).write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
