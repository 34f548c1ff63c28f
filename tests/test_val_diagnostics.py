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
        cfg, root, "training", batch_size=2, min_window=8, max_window=8,
        cache="none", deterministic=True,
    )
    a = next(iter(loader))
    loader._step = 0  # reset
    b = next(iter(loader))
    np.testing.assert_array_equal(a["vis"].idx, b["vis"].idx)
    np.testing.assert_array_equal(a["vis"].actions, b["vis"].actions)
