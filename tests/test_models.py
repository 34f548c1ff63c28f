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
