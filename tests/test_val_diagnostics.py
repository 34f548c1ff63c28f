"""clip_groundtruth diagnostic + deterministic validation loader."""

import numpy as np
import jax

from hulc_tpu.config import get_config
from hulc_tpu.data.fixtures import make_fixture_dataset
from hulc_tpu.data.loader import make_loaders
from hulc_tpu.evaluation.metrics import clip_groundtruth_metrics
from hulc_tpu.models import example_batch, init_params, make_model


def test_clip_groundtruth_metrics():
    cfg = get_config("hulc_debug")
    model = make_model(cfg)
    lang = example_batch(cfg, lang=True)._replace(use_for_aux_lang_loss=np.ones(2, bool))
    batch = {"vis": example_batch(cfg), "lang": lang}
    params = init_params(model, jax.random.key(0), batch)

    from hulc_tpu.training.preprocess import preprocess_batch

    prep = preprocess_batch(cfg, batch, rng=None, train=False)
    emb, _ = model.apply({"params": params}, prep["lang"], method=model.encode)
    _, seq_feat = model.apply(
        {"params": params}, emb, method=lambda m, e: m.plan_recognition(e)
    )
    rng = np.random.default_rng(0)
    bank_emb = rng.normal(size=(6, 384)).astype(np.float32)
    bank_ids = np.asarray([0, 0, 1, 1, 2, 2])
    gt = np.asarray([0, 2])
    out = clip_groundtruth_metrics(
        model, params, seq_feat, gt, bank_emb, bank_ids, mask=np.ones(2, bool)
    )
    assert set(out) == {"lang_gt_score", "lang_gt_sr"}
    assert 0.0 <= out["lang_gt_sr"] <= 1.0
    # all-False mask -> empty dict (skipped, reference behavior)
    assert clip_groundtruth_metrics(
        model, params, seq_feat, gt, bank_emb, bank_ids, mask=np.zeros(2, bool)
    ) == {}


def test_deterministic_val_loader(tmp_path):
    root = make_fixture_dataset(tmp_path, num_episodes=1, episode_len=48)
    cfg = get_config("gcbc_debug")
    loader = make_loaders(
        cfg, root, "training", batch_size=2, min_window=8, max_window=12,
        cache="none", deterministic=True,
    )
    # thread-free determinism check: the per-modality deterministic batches
    # (iterators reset _step themselves; the prefetch thread is exercised by
    # the trainer tests)
    vis = loader.loaders["vis"]
    a = vis.deterministic_batch(0)
    b = vis.deterministic_batch(0)
    np.testing.assert_array_equal(a.idx, b.idx)
    np.testing.assert_array_equal(a.actions, b.actions)
    np.testing.assert_array_equal(a.rgb_static, b.rgb_static)
    # fresh iterators start at the same slice every epoch
    first_epoch = next(iter(loader))
    second_epoch = next(iter(loader))
    np.testing.assert_array_equal(first_epoch["vis"].idx, second_epoch["vis"].idx)


def test_clip_groundtruth_callback(tmp_path):
    import jax

    from hulc_tpu.evaluation.metrics import ClipGroundtruthCallback
    from hulc_tpu.training.trainer import Trainer, TrainerConfig

    root = make_fixture_dataset(tmp_path / "d", num_episodes=2, episode_len=48)
    cfg = get_config("hulc_debug")
    loader = make_loaders(
        cfg, root, "training", batch_size=2, min_window=8, max_window=8,
        cache="none", deterministic=True,
    )
    trainer = Trainer(cfg, TrainerConfig(run_dir=str(tmp_path / "run"), num_devices=1, donate_state=False))
    raw = next(iter(loader))
    state = trainer.init_state(raw, steps_per_epoch=1)
    cb = ClipGroundtruthCallback(loader, max_batches=1)
    out = cb.on_epoch_end(trainer, state, epoch=0)
    if out is not None:  # None when the sampled mask was all-False
        assert 0.0 <= out["lang_gt_sr"] <= 1.0
