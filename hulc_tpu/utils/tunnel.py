"""Tunneled-runtime (axon) host-memory hygiene.

The axon TPU plugin keeps a client-side *journal* of every request it has
sent — including the serialized bytes of every H2D transfer — so it can
re-bind and replay the stream if the tunnel connection drops.  For
long-running jobs that ship fresh batches every step this retention is
unbounded: measured +4.004 MB of host RSS per 4.0 MB input dispatch
(exactly the transfer size; survives ``.delete()``, ``gc`` and
``malloc_trim``), which is what drove the 1000-chain protocol run to a
59.8 GB peak RSS (PROTOCOL.json round 4).

Setting ``AXON_JOURNAL_COMPACT=1`` before the backend initializes makes the
client compact the journal as requests complete: measured growth drops to
allocator noise (+0.003 MB/iter shell-set, +0.13 MB/iter set in-process
before first use) with no per-dispatch latency cost.  The trade-off is that
a dropped connection can no longer be transparently replayed — the process
fails instead.  For our entry points that is the right default: training
and the protocol evaluator both have checkpoint/resume machinery, and an
un-compacted journal would OOM the host long before a multi-hour run
finishes anyway.  Escape hatch: ``HULC_TUNNEL_JOURNAL=keep``.

There is no reference counterpart (the reference's CUDA runtime has no
tunnel); this is a TPU-rig-specific mitigation.
"""

from __future__ import annotations

import os

_ENV = "AXON_JOURNAL_COMPACT"
_OPT_OUT = "HULC_TUNNEL_JOURNAL"


def compact_tunnel_journal() -> bool:
    """Enable journal compaction for the axon tunnel client.

    Must run before the first JAX backend use (first ``jax.devices()`` /
    dispatch) — the sitecustomize ``import jax`` at interpreter start is
    fine, because the plugin reads the env at backend *initialization*,
    not at import.  Returns True if compaction is (now) requested.
    """
    if os.environ.get(_OPT_OUT, "").lower() == "keep":
        return False
    os.environ.setdefault(_ENV, "1")
    return os.environ[_ENV] == "1"
