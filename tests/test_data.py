"""Data layer: fixture schema, window sampling semantics, batch assembly."""

import numpy as np
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.data.dataset import (
    EpisodeStore,
    LangWindowSampler,
    VisionWindowSampler,
    pad_window,
)
from hulc_tpu.data.fixtures import make_fixture_dataset
from hulc_tpu.data.loader import CombinedLoader, make_loaders


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_fixture_dataset(tmp_path_factory.mktemp("calvin"), num_episodes=2, episode_len=64)


def test_fixture_schema(fixture_root):
    import pathlib

    train = fixture_root / "training"
    assert (train / "ep_start_end_ids.npy").exists()
    assert (train / "statistics.yaml").exists()
    data = np.load(
        train / "lang_paraphrase-MiniLM-L3-v2" / "auto_lang_ann.npy", allow_pickle=True
    ).item()
    assert set(data["language"].keys()) == {"ann", "task", "emb"}
    assert data["language"]["emb"].shape[1:] == (1, 384)
    assert len(data["info"]["indx"]) == len(data["language"]["ann"])
    # validation split has rollout embeddings
    emb = np.load(
        fixture_root / "validation" / "lang_paraphrase-MiniLM-L3-v2" / "embeddings.npy",
        allow_pickle=True,
    ).item()
    assert all("emb" in v and "ann" in v for v in emb.values())


def test_episode_store_ram_vs_disk(fixture_root):
    keys = ("rgb_static", "actions", "robot_obs")
    ram = EpisodeStore(fixture_root / "training", keys=keys, cache="ram")
    disk = EpisodeStore(fixture_root / "training", keys=keys, cache="none")
    w1 = ram.get_window(5, 10)
    w2 = disk.get_window(5, 10)
    for k in keys:
        np.testing.assert_array_equal(w1[k], w2[k])
    assert w1["rgb_static"].shape == (10, 64, 64, 3)
    assert ram.num_frames == 128


def test_vision_sampler_bounds(fixture_root):
    store = EpisodeStore(fixture_root / "training", keys=("actions",), cache="none")
    sampler = VisionWindowSampler(store.episode_ranges, min_window=20, max_window=32, seed=0)
    ranges = {a: b for a, b in store.episode_ranges}
    for _ in range(200):
        s = sampler.sample()
        assert 20 <= s.length <= 32
        # window must stay inside one episode
        ep = [r for r in store.episode_ranges if r[0] <= s.start <= r[1]]
        assert len(ep) == 1
        assert s.start + s.length - 1 <= ep[0][1]


def test_lang_sampler_aux_mask_semantics(fixture_root):
    sampler = LangWindowSampler(
        fixture_root / "training", min_window=20, max_window=32, aux_lang_loss_window=8, seed=0
    )
    assert len(sampler) > 0
    saw_true = saw_false = False
    for _ in range(300):
        s = sampler.sample()
        a, b = sampler.ranges[s.lang_idx]
        assert a <= s.start and s.start + s.length - 1 <= b
        expected = (b + 1 - (s.start + s.length)) < 8
        assert s.use_for_aux_lang_loss == expected
        saw_true |= expected
        saw_false |= not expected
    assert saw_true and saw_false


def test_pad_window_semantics():
    w = {
        "rgb_static": np.arange(3 * 2 * 2 * 3, dtype=np.uint8).reshape(3, 2, 2, 3),
        "rel_actions": np.asarray(
            [[0.5, 0.5, 0.5, 0.1, 0.1, 0.1, -1.0]] * 3, np.float32
        ),
        "actions": np.asarray([[0.2] * 7] * 3, np.float32),
    }
    out = pad_window(w, 5)
    assert out["rgb_static"].shape[0] == 5
    np.testing.assert_array_equal(out["rgb_static"][3], w["rgb_static"][2])  # repeat last
    np.testing.assert_array_equal(out["actions"][4], w["actions"][2])
    # rel_actions: zero motion, keep gripper
    np.testing.assert_array_equal(out["rel_actions"][4, :6], np.zeros(6))
    assert out["rel_actions"][4, 6] == -1.0


def test_combined_loader_batches(fixture_root):
    cfg = get_config("hulc_debug")
    loader = make_loaders(cfg, fixture_root, batch_size=4, cache="none")
    batch = next(iter(loader))
    assert set(batch.keys()) == {"vis", "lang"}
    vis, lang = batch["vis"], batch["lang"]
    assert vis.rgb_static.shape == (4, 32, 64, 64, 3) and vis.rgb_static.dtype == np.uint8
    assert vis.rgb_gripper.shape == (4, 32, 48, 48, 3)
    assert vis.robot_obs.shape == (4, 32, 8)
    assert vis.actions.shape == (4, 32, 7)
    assert vis.state_info_robot_obs.shape == (4, 32, 15)
    assert vis.lang is None
    assert lang.lang.shape == (4, 384)
    assert lang.use_for_aux_lang_loss.shape == (4,)
    assert len(loader) >= 1


def test_loader_feeds_model(fixture_root):
    """End-to-end: fixture data -> loader -> preprocessing -> train_losses."""
    import jax

    from hulc_tpu.models import init_params, make_model
    from hulc_tpu.training.preprocess import preprocess_batch

    cfg = get_config("hulc_debug")
    model = make_model(cfg)
    # debug preset sizes its position table for 8-frame windows
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    raw = next(iter(loader))
    batch = preprocess_batch(cfg, raw, rng=jax.random.key(0), train=True)
    params = init_params(model, jax.random.key(0), batch)
    losses = model.apply(
        {"params": params},
        jax.random.key(1),
        batch,
        0.01,
        method=model.train_losses,
        rngs={"dropout": jax.random.key(2)},
    )
    assert np.isfinite(float(losses["total_loss"]))


def test_offset_frame_numbering(tmp_path):
    """Real CALVIN validation splits start at a large frame index (e.g.
    episode_0358482.npz); the store and samplers must honor the offset."""
    import pathlib

    from hulc_tpu.data.fixtures import EP_FMT, _frame

    split = tmp_path / "validation"
    split.mkdir()
    rng = np.random.default_rng(0)
    start = 358482
    n = 30
    for i in range(n):
        np.savez(split / EP_FMT.format(start + i), **_frame(rng, small=True))
    np.save(split / "ep_start_end_ids.npy", np.asarray([[start, start + n - 1]], np.int64))

    store = EpisodeStore(split, keys=("rgb_static", "actions"), cache="ram")
    w = store.get_window(start + 5, 10)
    assert w["actions"].shape == (10, 7)
    # disk mode must agree with the RAM cache at the same absolute index
    disk = EpisodeStore(split, keys=("rgb_static", "actions"), cache="none")
    np.testing.assert_array_equal(w["actions"], disk.get_window(start + 5, 10)["actions"])

    sampler = VisionWindowSampler(store.episode_ranges, min_window=8, max_window=12, seed=0)
    for _ in range(50):
        s = sampler.sample()
        assert start <= s.start and s.start + s.length - 1 <= start + n - 1
    batch = store.gather_padded("actions", [start + 20], [10], 12)
    np.testing.assert_array_equal(batch[0, :10], disk.get_window(start + 20, 10)["actions"])
    np.testing.assert_array_equal(batch[0, 11], batch[0, 9])  # pad repeats last


def test_auto_annotation_pipeline(tmp_path):
    """annotate_play_data detects scripted task events with the oracle and
    the CLI writes a loadable auto_lang_ann.npy (lang_ann.yaml pipeline)."""
    from hulc_tpu.data.dataset import EpisodeStore, LangWindowSampler
    from hulc_tpu.data.language import annotate_play_data, main as lang_main

    split = tmp_path / "training"
    split.mkdir()
    n = 200
    scene = np.zeros((n, 24), np.float32)
    # script: drawer opens over frames 40-70 (idx 1: 0 -> 0.2), LED turns on
    # at frame 130 (idx 5: 0 -> 1)
    scene[40:70, 1] = np.linspace(0.0, 0.2, 30)
    scene[70:, 1] = 0.2
    scene[130:, 5] = 1.0
    for i in range(n):
        np.savez(split / f"episode_{i:07d}.npz", scene_obs=scene[i])
    np.save(split / "ep_start_end_ids.npy", np.asarray([[0, n - 1]], np.int64))

    store = EpisodeStore(split, keys=["scene_obs"], cache="ram")
    anns = annotate_play_data(store, window=64, prior_steps_window=32, stride=8)
    tasks = {t for _, t, _ in anns}
    assert "open_drawer" in tasks and "turn_on_led" in tasks
    drawer = next(a for a in anns if a[1] == "open_drawer")
    start, end = drawer[2]
    assert 55 <= end <= 75 and end - start <= 32  # completion near frame ~65
    led = next(a for a in anns if a[1] == "turn_on_led")
    assert 125 <= led[2][1] <= 140

    # CLI end-to-end with the hash embedder -> LangWindowSampler loads it
    lang_main(["--data", str(split), "--window", "64",
               "--prior-steps-window", "32", "--stride", "8"])
    sampler = LangWindowSampler(split, min_window=8, max_window=16)
    assert len(sampler) > 0
    s = sampler.sample()
    assert s.lang_idx >= 0


def test_combined_loader_multiworker(fixture_root):
    """num_workers > 1 yields exactly len(loader) schema-correct batches
    (order may differ; sampling is serialized, assembly is parallel)."""
    cfg = get_config("gcbc_debug")
    loader = make_loaders(
        cfg, fixture_root, batch_size=2, min_window=8, max_window=8,
        cache="none", num_workers=3,
    )
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert set(b) == {"vis", "lang"}
        assert b["vis"].rgb_static.shape[0] == 2
        assert b["vis"].rgb_static.dtype == np.uint8
        assert b["lang"].lang is not None
    # a second epoch works (threads respawn cleanly)
    assert len(list(loader)) == len(loader)


def test_loader_side_fusion_matches_in_graph_fusion(fixture_root):
    """{"fused": 2B} host-stacked batches produce bitwise the same losses as
    the in-graph fuse_modalities concat (no-aug preprocessing; same rng)."""
    import jax
    import jax.numpy as jnp

    from hulc_tpu.data.loader import CombinedLoader
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.training.preprocess import preprocess_batch

    cfg = get_config("hulc_debug", fuse_modalities=True)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    rng = jax.random.key(7)

    prep_sep = preprocess_batch(cfg, batch, rng=None, train=False)
    losses_graph = model.apply(
        {"params": params}, rng, prep_sep, 0.01, method=model.train_losses,
        rngs={"dropout": jax.random.key(3)},
    )

    fused = CombinedLoader.fuse_batch(batch)
    prep_fused = preprocess_batch(cfg, fused, rng=None, train=False)
    losses_loader = model.apply(
        {"params": params}, rng, prep_fused, 0.01, method=model.train_losses,
        rngs={"dropout": jax.random.key(3)},
    )
    for k in losses_graph:
        np.testing.assert_allclose(
            np.asarray(losses_graph[k]), np.asarray(losses_loader[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_fused_loader_schema(fixture_root):
    """fuse=True emits {"fused"} with [vis; lang] stacking and lang fields."""
    cfg = get_config("gcbc_debug")
    loader = make_loaders(
        cfg, fixture_root, batch_size=2, min_window=8, max_window=8,
        cache="none", fuse=True,
    )
    batch = next(iter(loader))
    assert set(batch) == {"fused"}
    f = batch["fused"]
    assert f.rgb_static.shape[0] == 4 and f.actions.shape[0] == 4
    assert f.lang is not None and f.lang.shape[0] == 2
    assert f.use_for_aux_lang_loss is not None and f.use_for_aux_lang_loss.shape[0] == 2


def test_fusion_disabled_multiprocess(fixture_root, monkeypatch):
    """Loader-side fusion must turn itself off under multi-process training:
    host_local_batch_to_global stitches per-PROCESS shards, which would break
    the fused pass's global [vis...; lang...] half-split."""
    import jax

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    cfg = get_config("gcbc_debug")
    loader = make_loaders(
        cfg, fixture_root, batch_size=2, min_window=8, max_window=8,
        cache="none", fuse=True,
    )
    assert loader.fuse is False
    batch = loader._make()
    assert set(batch) == {"vis", "lang"}


def test_load_frames_parallel_matches_serial(fixture_root):
    """The pooled warm-up decoder (EpisodeStore.load_frames, used by the RAM
    cache and shm populate) must produce byte-identical stacks to the serial
    path at any worker count."""
    from hulc_tpu.data.dataset import EpisodeStore

    store = EpisodeStore(fixture_root / "training", cache="none")
    a, b = store.episode_ranges[0]
    count = min(24, b - a)
    serial = store.load_frames(a, count, workers=1)
    pooled = store.load_frames(a, count, workers=4)
    assert set(serial) == set(pooled)
    for k in serial:
        np.testing.assert_array_equal(serial[k], pooled[k])


def test_robot_scene_proprio(fixture_root):
    """include_scene=True feeds [robot_obs(15); scene_obs(24)] (each
    normalized with its own statistics) through keep_indices — the
    reference's proprioception_dims/robot_scene.yaml preset."""
    import dataclasses

    from hulc_tpu.config import ProprioConfig

    base = get_config("gcbc_debug")
    pe = dataclasses.replace(
        base.perceptual_encoder,
        proprio=ProprioConfig(n_state_obs=39, keep_indices=((0, 39),), include_scene=True),
    )
    cfg = get_config("gcbc_debug", perceptual_encoder=pe)
    assert cfg.perceptual_encoder.latent_size == base.perceptual_encoder.latent_size + 39

    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    mod = next(iter(loader))["vis"]
    assert mod.robot_obs.shape[-1] == 39
    # fixture statistics are mean 0 / std 1, so the normalized robot half
    # must equal the raw state_info copy exactly
    np.testing.assert_allclose(mod.robot_obs[..., :15], mod.state_info_robot_obs, rtol=1e-6)
    assert np.isfinite(mod.robot_obs).all()
