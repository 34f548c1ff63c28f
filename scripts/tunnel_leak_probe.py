"""Isolate the tunneled-runtime host RSS growth (~input-bytes per dispatch).

Variants:
  same_dev   : re-feed the SAME committed device arrays (no H2D) -- control
  same_np    : re-feed the SAME np array object (H2D each dispatch, same bytes)
  fresh_np   : fresh np array each dispatch (the eval-loop pattern)
  fresh_del  : fresh np + explicit device_put; .delete() the device array after
  fresh_trim : fresh np + malloc_trim(0) each step (allocator-retention test)

RSS from /proc/self/status VmRSS. One jitted matmul-ish fn, ~4 MB input.

Round-4 receipts on the real chip (15-40 iters/variant):
  default            : same_dev +0.00, every H2D variant +4.004 MB/iter
                       (exactly the transfer bytes; survives trim/gc/delete)
  AXON_JOURNAL_COMPACT=1 : all variants +0.003 MB/iter, same ms/iter
Mechanism: the axon plugin journals every request for replay-on-connection-
drop (strings in the plugin .so: "journal: connection dropped; re-binding
and replaying"). See hulc_tpu/utils/tunnel.py for the production default.

    python scripts/tunnel_leak_probe.py [iters]
    AXON_JOURNAL_COMPACT=1 python scripts/tunnel_leak_probe.py [iters]
"""
import ctypes
import gc
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

libc = ctypes.CDLL("libc.so.6")


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0


N = 1024  # 1024x1024 f32 = 4 MB
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 60


@jax.jit
def step(x):
    return (x @ x.T).sum()


dev = jax.devices()[0]
x0 = np.random.rand(N, N).astype(np.float32)
_ = float(step(x0))  # compile + warm D2H

mb_in = x0.nbytes / 1e6
print(f"input {mb_in:.1f} MB, {ITERS} iters/variant", flush=True)


def run(name, fn):
    gc.collect()
    libc.malloc_trim(0)
    r0 = rss_mb()
    t0 = time.perf_counter()
    fn()
    gc.collect()
    dt = time.perf_counter() - t0
    r1 = rss_mb()
    libc.malloc_trim(0)
    r2 = rss_mb()
    grow = (r1 - r0) / ITERS
    grow_t = (r2 - r0) / ITERS
    print(f"{name:10s}: rss {r0:7.1f} -> {r1:7.1f} MB "
          f"({grow:+6.3f} MB/iter; after trim {r2:7.1f}, {grow_t:+6.3f} MB/iter; "
          f"{dt/ITERS*1e3:.0f} ms/iter)", flush=True)


xd = jax.device_put(x0, dev)
_ = float(step(xd))


def same_dev():
    for _ in range(ITERS):
        _ = float(step(xd))


def same_np():
    for _ in range(ITERS):
        _ = float(step(x0))


def fresh_np():
    for i in range(ITERS):
        x = np.random.rand(N, N).astype(np.float32)
        _ = float(step(x))


def fresh_del():
    for i in range(ITERS):
        x = np.random.rand(N, N).astype(np.float32)
        xd2 = jax.device_put(x, dev)
        _ = float(step(xd2))
        xd2.delete()


def fresh_trim():
    for i in range(ITERS):
        x = np.random.rand(N, N).astype(np.float32)
        _ = float(step(x))
        libc.malloc_trim(0)


for nm, fn in [("same_dev", same_dev), ("same_np", same_np),
               ("fresh_np", fresh_np), ("fresh_del", fresh_del),
               ("fresh_trim", fresh_trim)]:
    run(nm, fn)
