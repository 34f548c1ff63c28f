"""Multi-GB shared-memory arena scale test (VERDICT r2 #9).

The reference's ShmDataset loads the full 166 GB CALVIN D split into
/dev/shm with a ~20 min warm-up (reference README.md:85-86). This script
exercises our arena at real scale without a dataset download: a synthetic
deterministic store populates an N-GB arena through the production
``ShmEpisodeCache.populate_from_store`` chunked path, then measures window
gather rates (single-thread and MT C++) and verifies content integrity.

Usage:  python scripts/shm_scale_test.py [--gb 8] [--chunk 256]
Writes a JSON summary line; unlinks the arena on exit.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from hulc_tpu.data.shm_store import ShmEpisodeCache

KEY_META = {
    "rgb_static": ((200, 200, 3), np.dtype(np.uint8)),
    "rgb_gripper": ((84, 84, 3), np.dtype(np.uint8)),
    "rel_actions": ((7,), np.dtype(np.float32)),
    "robot_obs": ((15,), np.dtype(np.float32)),
    "scene_obs": ((24,), np.dtype(np.float32)),
}
FRAME_BYTES = sum(int(np.prod(s)) * d.itemsize for s, d in KEY_META.values())


def frame_value(key: str, i: int) -> int:
    """Deterministic per-frame fill value (regeneratable for verification)."""
    return (i * 31 + len(key)) % 251


class SyntheticStore:
    """EpisodeStore stand-in generating CALVIN-shaped frames on the fly."""

    def __init__(self, n_frames: int):
        self.episode_ranges = [(0, n_frames - 1)]
        self._min_frame = 0
        self._max_frame = n_frames - 1

    def get_window(self, start: int, count: int):
        out = {}
        for k, (shape, dtype) in KEY_META.items():
            arr = np.empty((count,) + shape, dtype)
            for j in range(count):
                arr[j] = frame_value(k, start + j)
            out[k] = arr
        return out

    def load_frames(self, start: int, count: int, workers=None):
        # EpisodeStore.load_frames contract (populate_from_store's decode
        # path); synthetic frames need no thread pool
        return self.get_window(start, count)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gb", type=float, default=8.0, help="arena size target")
    p.add_argument("--chunk", type=int, default=256, help="populate chunk (frames)")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--window", type=int, default=32)
    args = p.parse_args(argv)

    n_frames = int(args.gb * 1e9 / FRAME_BYTES)
    total_gb = n_frames * FRAME_BYTES / 1e9
    store = SyntheticStore(n_frames)
    name = f"/hulc_scale_{int(time.time())}"
    print(f"[scale] populating {total_gb:.2f} GB arena ({n_frames} frames, "
          f"{FRAME_BYTES} B/frame, chunk {args.chunk})", flush=True)

    t0 = time.perf_counter()
    cache = ShmEpisodeCache.populate_from_store(name, store, chunk=args.chunk)
    populate_s = time.perf_counter() - t0
    try:
        assert cache.ready and cache.n_frames == n_frames

        # content integrity at far offsets (catches 32-bit offset bugs)
        for probe in (0, n_frames // 2, n_frames - 1):
            for k in ("rgb_static", "rel_actions"):
                got = cache.key_array(k)[probe]
                want = frame_value(k, probe)
                assert np.all(got == np.asarray(want, got.dtype)), (k, probe)

        # gather throughput: batch windows scattered across the full arena
        rng = np.random.default_rng(0)
        gather = {}
        out_bytes = None
        for nt in (1, 2, 4):
            rates = []
            for _ in range(3):
                starts = rng.integers(0, n_frames - args.window, args.batch)
                lengths = np.full(args.batch, args.window, np.int64)
                t0 = time.perf_counter()
                got = {
                    k: cache.gather_windows(k, starts, lengths, args.window, n_threads=nt)
                    for k in KEY_META
                }
                dt = time.perf_counter() - t0
                out_bytes = sum(v.nbytes for v in got.values())
                rates.append(out_bytes / dt / 1e6)
            gather[nt] = round(max(rates), 1)
            # spot-verify one window per thread count
            np.testing.assert_array_equal(
                got["rgb_static"][0, 0],
                np.full((200, 200, 3), frame_value("rgb_static", starts[0]), np.uint8),
            )

        summary = {
            "arena_gb": round(total_gb, 2),
            "populate_s": round(populate_s, 1),
            "populate_mb_s": round(total_gb * 1e3 / populate_s, 1),
            "gather_mb_s_by_threads": gather,
            "gather_batch_mb": round(out_bytes / 1e6, 1),
            "verified": True,
        }
        print(json.dumps(summary))
        return summary
    finally:
        cache.close(unlink=True)


if __name__ == "__main__":
    main()
