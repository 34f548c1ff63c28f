"""Native shared-memory episode cache: build, write/read, window gather,
cross-handle readiness, and EpisodeStore population."""

import numpy as np
import pytest

from hulc_tpu.data.shm_store import ShmEpisodeCache


KEY_META = {
    "rgb": ((8, 8, 3), np.dtype(np.uint8)),
    "actions": ((7,), np.dtype(np.float32)),
}


@pytest.fixture()
def arena():
    name = f"/hulc_test_{np.random.default_rng().integers(1 << 30)}"
    cache = ShmEpisodeCache.create(name, 64, KEY_META)
    yield name, cache
    cache.close(unlink=True)


def test_write_read_roundtrip(arena):
    name, cache = arena
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (64, 8, 8, 3), np.uint8)
    act = rng.normal(size=(64, 7)).astype(np.float32)
    cache.write("rgb", 0, rgb)
    cache.write("actions", 0, act)
    np.testing.assert_array_equal(cache.key_array("rgb"), rgb)
    np.testing.assert_array_equal(cache.key_array("actions"), act)


def test_gather_windows_with_padding(arena):
    name, cache = arena
    act = np.arange(64 * 7, dtype=np.float32).reshape(64, 7)
    cache.write("actions", 0, act)
    out = cache.gather_windows("actions", starts=[0, 10], lengths=[4, 6], max_window=8)
    assert out.shape == (2, 8, 7)
    np.testing.assert_array_equal(out[0, :4], act[0:4])
    np.testing.assert_array_equal(out[0, 4], act[3])  # pad = repeat last
    np.testing.assert_array_equal(out[0, 7], act[3])
    np.testing.assert_array_equal(out[1, :6], act[10:16])
    np.testing.assert_array_equal(out[1, 6], act[15])


def test_cross_handle_attach_and_ready(arena):
    name, cache = arena
    act = np.ones((64, 7), np.float32)
    cache.write("actions", 0, act)
    reader = ShmEpisodeCache.attach(name, KEY_META)
    assert not reader.ready
    cache.set_ready()
    reader.wait_ready(timeout_s=5)
    np.testing.assert_array_equal(reader.key_array("actions"), act)
    reader.close()


def test_populate_from_store(tmp_path):
    from hulc_tpu.data.dataset import EpisodeStore
    from hulc_tpu.data.fixtures import make_fixture_dataset

    root = make_fixture_dataset(tmp_path, num_episodes=1, episode_len=16)
    store = EpisodeStore(root / "training", keys=("rgb_static", "actions"), cache="none")
    name = f"/hulc_test_pop_{np.random.default_rng().integers(1 << 30)}"
    cache = ShmEpisodeCache.populate_from_store(name, store)
    try:
        assert cache.ready
        assert cache.n_frames == 16
        direct = store.get_window(3, 5)
        gathered = cache.gather_windows("rgb_static", [3], [5], 5)[0]
        np.testing.assert_array_equal(gathered, direct["rgb_static"])
    finally:
        cache.close(unlink=True)


def test_gather_bounds_check(arena):
    name, cache = arena
    with pytest.raises(ValueError):
        cache.gather_windows("actions", starts=[60], lengths=[10], max_window=10)


def test_gather_windows_mt_matches_single(arena):
    """The threaded C++ gather is bit-identical to the single-thread path
    for every thread count (including n_threads > batch)."""
    name, cache = arena
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (64, 8, 8, 3), np.uint8)
    cache.write("rgb", 0, rgb)
    starts = [0, 5, 20, 33, 50, 58, 2, 13, 41]
    lengths = [4, 8, 3, 6, 8, 6, 1, 8, 2]
    ref = cache.gather_windows("rgb", starts, lengths, max_window=8, n_threads=1)
    for nt in (2, 3, 4, 16):
        out = cache.gather_windows("rgb", starts, lengths, max_window=8, n_threads=nt)
        np.testing.assert_array_equal(out, ref)


def test_gather_windows_mt_bounds_check(arena):
    name, cache = arena
    with pytest.raises(ValueError):
        cache.gather_windows("actions", [60], [8], max_window=8, n_threads=4)
