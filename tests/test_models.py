"""Model-level tests: presets build, losses finite, gradients flow, masked
aux losses match subset semantics, SpatialSoftmax parity, decoder carry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.models import example_batch, init_params, make_model
from hulc_tpu.models.hulc import masked_clip_loss


@pytest.fixture(scope="module", params=["hulc_debug", "gcbc_debug", "mcil_debug"])
def model_and_params(request):
    cfg = get_config(request.param)
    model = make_model(cfg)
    lang = example_batch(cfg, lang=True)
    # ensure the aux-lang mask has active entries so aux heads get gradient
    lang = lang._replace(use_for_aux_lang_loss=np.ones(2, bool))
    batch = {"vis": example_batch(cfg), "lang": lang}
    params = init_params(model, jax.random.key(0), batch)
    return request.param, cfg, model, batch, params


def test_train_losses_finite(model_and_params):
    name, cfg, model, batch, params = model_and_params
    losses = model.apply(
        {"params": params},
        jax.random.key(1),
        batch,
        0.01,
        method=model.train_losses,
        rngs={"dropout": jax.random.key(2)},
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{name}: {k} not finite"
    assert float(losses["action_loss"]) > 0
    if name == "gcbc_debug":
        assert float(losses["kl_loss"]) == 0.0
    else:
        assert float(losses["kl_loss"]) != 0.0


def test_gradients_flow(model_and_params):
    name, cfg, model, batch, params = model_and_params

    def loss_fn(p):
        out = model.apply(
            {"params": p},
            jax.random.key(1),
            batch,
            0.01,
            method=model.train_losses,
            rngs={"dropout": jax.random.key(2)},
        )
        return out["total_loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(1 for _, g in flat if np.abs(np.asarray(g)).sum() > 0)
    zero_paths = [jax.tree_util.keystr(p) for p, g in flat if np.abs(np.asarray(g)).sum() == 0]
    # Legitimately dead params (same in the torch reference):
    # - GCBC: proposal net + recognition fc_state exist but are unused;
    # - MCIL BiRNN: seq_feat reads the LAST timestep, which for the backward
    #   direction is its first step (h0 = 0), so the final backward layer's
    #   recurrent matrix w_hh never contributes.
    allowed_dead = ("plan_proposal", "fc_state", "bwd_1']['hh_0")
    unexpected = [p for p in zero_paths if not any(a in p for a in allowed_dead)]
    assert not unexpected, f"{name}: dead params {unexpected[:5]}"
    assert nonzero > 0


def test_val_metrics(model_and_params):
    name, cfg, model, batch, params = model_and_params
    metrics = model.apply(
        {"params": params}, jax.random.key(3), batch, method=model.val_metrics
    )
    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), f"{name}: {k} not finite"
    assert 0.0 <= float(metrics["vis_gripper_sr_pp"]) <= 1.0


def test_masked_clip_equals_subset():
    """Masked CLIP loss must equal computing CLIP on the boolean subset."""
    rng = np.random.default_rng(0)
    b, d = 16, 8
    img = rng.normal(size=(b, d)).astype(np.float32)
    txt = rng.normal(size=(b, d)).astype(np.float32)
    mask = rng.uniform(size=b) > 0.4
    scale = jnp.asarray(14.0)

    masked = float(masked_clip_loss(jnp.asarray(img), jnp.asarray(txt), scale, jnp.asarray(mask)))
    subset = float(
        masked_clip_loss(jnp.asarray(img[mask]), jnp.asarray(txt[mask]), scale, None)
    )
    assert abs(masked - subset) < 1e-5

    # all-False mask -> exactly 0 (reference's skip_batch hack)
    zero = float(masked_clip_loss(jnp.asarray(img), jnp.asarray(txt), scale, jnp.zeros(b, bool)))
    assert zero == 0.0


def test_clip_loss_nonzero_in_training():
    cfg = get_config("hulc_debug")
    model = make_model(cfg)
    lang_batch = example_batch(cfg, lang=True)
    lang_batch = lang_batch._replace(use_for_aux_lang_loss=np.ones(2, bool))
    batch = {"vis": example_batch(cfg), "lang": lang_batch}
    params = init_params(model, jax.random.key(0), batch)
    losses = model.apply(
        {"params": params},
        jax.random.key(1),
        batch,
        0.01,
        method=model.train_losses,
        rngs={"dropout": jax.random.key(2)},
    )
    assert float(losses["lang_clip_loss"]) > 0.0


def test_spatial_softmax_matches_reference(ref_pytorch3d):
    """Parity with the reference SpatialSoftmax (vision_network.py)."""
    import torch
    from tests.conftest import load_reference_module

    ref_vis = load_reference_module(
        "hulc/models/perceptual_encoders/vision_network.py", "ref_vision_network"
    )
    n, c, h, w = 2, 5, 7, 7
    x = np.random.default_rng(4).normal(size=(n, c, h, w)).astype(np.float32)
    t_mod = ref_vis.SpatialSoftmax(num_rows=h, num_cols=w, temperature=1.0)
    with torch.no_grad():
        theirs = t_mod(torch.from_numpy(x)).numpy()

    from hulc_tpu.models.vision import SpatialSoftmax

    mod = SpatialSoftmax(temperature=1.0)
    ours = mod.apply({}, jnp.asarray(x.transpose(0, 2, 3, 1)))  # NHWC
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_decoder_act_streaming_consistency():
    """Closed-loop act() with carry: gripper channel stays in bounds and the
    carry actually evolves (stateful RNN behavior)."""
    cfg = get_config("hulc_debug")
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)

    vis = batch["vis"]
    emb, _ = model.apply({"params": params}, vis, method=model.encode)
    goal = model.apply({"params": params}, emb[:, -1], method=model.encode_visual_goal)
    plan = model.apply(
        {"params": params}, jax.random.key(5), emb, goal, method=model.propose_plan
    )
    carry = model.apply({"params": params}, 2, method=model.init_decoder_carry)
    actions, new_carry = model.apply(
        {"params": params},
        jax.random.key(6),
        plan,
        emb[:, :1],
        goal,
        vis.state_info_robot_obs[:, :1],
        carry,
        method=model.decoder_act,
    )
    assert actions.shape == (2, 1, 7)
    assert set(np.unique(np.asarray(actions[..., -1]))) <= {-1.0, 1.0}
    assert np.abs(np.asarray(new_carry)).sum() > 0


def test_per_sample_reductions_match_scalar():
    """per_sample=True variants average back to the scalar forms exactly."""
    import dataclasses

    from hulc_tpu.config import get_config
    from hulc_tpu.models import example_batch, init_params, make_model
    from hulc_tpu.models.plan_nets import make_plan_distribution

    cfg = get_config("hulc_debug")
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    mb = batch["vis"]
    emb, _ = model.apply({"params": params}, mb, method=model.encode)
    goal = model.apply({"params": params}, emb[:, -1], method=model.encode_visual_goal)

    def dec_loss(per_sample):
        return model.apply(
            {"params": params},
            method=lambda m: m.action_decoder.loss(
                jnp.zeros((emb.shape[0], m.cfg.distribution.plan_dim)),
                emb, goal, mb.actions, mb.state_info_robot_obs, per_sample=per_sample,
            ),
        )

    ps = dec_loss(True)
    assert ps.shape == (emb.shape[0],)
    np.testing.assert_allclose(float(jnp.mean(ps)), float(dec_loss(False)), rtol=1e-6)

    dist = make_plan_distribution(cfg.distribution)
    rng = np.random.default_rng(0)
    mk = lambda: dist.make_state(jnp.asarray(rng.normal(size=(4, dist.state_dim)), jnp.float32))
    p, q = mk(), mk()
    ps_kl = dist.balanced_kl(p, q, 0.8, per_sample=True)
    assert ps_kl.shape == (4,)
    np.testing.assert_allclose(float(jnp.mean(ps_kl)), float(dist.balanced_kl(p, q, 0.8)), rtol=1e-6)


def test_fused_modality_losses_match_split_gcbc():
    """The fused 2B-batch path computes the same losses as the per-modality
    loop (GCBC: no plan sampling, so both paths are deterministic given the
    same inputs; dropout rates are 0 in the debug config)."""
    import dataclasses

    from hulc_tpu.config import get_config
    from hulc_tpu.models import example_batch, init_params, make_model

    base = get_config("gcbc_debug")
    batch = {"vis": example_batch(base), "lang": example_batch(base, lang=True)}

    outs = {}
    for fused in (True, False):
        cfg = dataclasses.replace(base, fuse_modalities=fused)
        model = make_model(cfg)
        params = init_params(model, jax.random.key(0), batch)
        outs[fused] = model.apply(
            {"params": params}, jax.random.key(1), batch, 0.01,
            method=model.train_losses, rngs={"dropout": jax.random.key(2)},
        )
    for key in ["total_loss", "action_loss", "lang_clip_loss",
                "action_loss_vis", "action_loss_lang"]:
        np.testing.assert_allclose(
            float(outs[True][key]), float(outs[False][key]), rtol=2e-5, atol=1e-5,
        ), key


def test_fused_modality_losses_hulc_finite():
    """Full HULC fused path: runs, finite, and logs per-modality values."""
    from hulc_tpu.config import get_config
    from hulc_tpu.models import example_batch, init_params, make_model

    import dataclasses

    cfg = dataclasses.replace(get_config("hulc_debug"), fuse_modalities=True)
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)}
    params = init_params(model, jax.random.key(0), batch)
    losses = model.apply(
        {"params": params}, jax.random.key(1), batch, 0.01,
        method=model.train_losses, rngs={"dropout": jax.random.key(2)},
    )
    for key in ["total_loss", "kl_loss", "action_loss", "lang_clip_loss",
                "action_loss_vis", "action_loss_lang", "kl_loss_scaled_lang"]:
        assert np.isfinite(float(losses[key])), key
    assert float(losses["kl_loss"]) > 0
