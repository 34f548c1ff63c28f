"""Dotted-path config overrides (reference: Hydra CLI overrides like
`python hulc/training.py model.action_decoder.hidden_size=4096`,
conf/config.yaml composition root — here `--set key=value` / apply_overrides)."""

import dataclasses

import pytest

from hulc_tpu.config import (
    ProprioConfig,
    VisionEncoderConfig,
    apply_overrides,
    get_config,
)


def test_leaf_int_and_resolve_propagation():
    cfg = apply_overrides(get_config("hulc_debug"), ["action_decoder.hidden_size=96"])
    assert cfg.action_decoder.hidden_size == 96
    # resolve() reran: inferred sizes stay consistent
    assert cfg.action_decoder.perceptual_features == cfg.perceptual_encoder.latent_size


def test_distribution_override_propagates_plan_features():
    cfg = apply_overrides(
        get_config("hulc_debug"),
        ["distribution.category_size=8", "distribution.class_size=8"],
    )
    assert cfg.distribution.plan_dim == 64
    assert cfg.action_decoder.plan_features == 64  # setup_input_sizes semantics


def test_bool_float_str_literals():
    cfg = apply_overrides(
        get_config("hulc_debug"),
        [
            "use_clip_auxiliary_loss=false",
            "loss.kl_beta=0.1",
            "action_decoder.rnn_cell=gru",
            "loss.clip_auxiliary_loss_beta=1",  # int literal widens to float
        ],
    )
    assert cfg.use_clip_auxiliary_loss is False
    assert cfg.loss.kl_beta == pytest.approx(0.1)
    assert cfg.action_decoder.rnn_cell == "gru"
    assert cfg.loss.clip_auxiliary_loss_beta == 1.0
    assert isinstance(cfg.loss.clip_auxiliary_loss_beta, float)


def test_nested_camera_field():
    cfg = apply_overrides(
        get_config("hulc_debug"), ["perceptual_encoder.rgb_static.input_size=32"]
    )
    assert cfg.perceptual_encoder.rgb_static.input_size == 32
    # sibling fields untouched
    assert cfg.perceptual_encoder.rgb_static.visual_features == 16


def test_optional_none_and_default():
    cfg = apply_overrides(
        get_config("gcbc_debug"), ["perceptual_encoder.rgb_gripper=none"]
    )
    assert cfg.perceptual_encoder.rgb_gripper is None
    cfg2 = apply_overrides(cfg, ["perceptual_encoder.rgb_gripper=default"])
    assert cfg2.perceptual_encoder.rgb_gripper == VisionEncoderConfig()


def test_descend_into_none_optional_instantiates_defaults():
    base = get_config("gcbc_debug")
    assert base.perceptual_encoder.proprio is None
    cfg = apply_overrides(base, ["perceptual_encoder.proprio.n_state_obs=5"])
    assert cfg.perceptual_encoder.proprio.n_state_obs == 5
    # other fields took ProprioConfig defaults
    assert cfg.perceptual_encoder.proprio.normalize is ProprioConfig().normalize
    # latent size accounting picked the proprio dims up through resolve()
    assert cfg.plan_proposal.perceptual_features == cfg.perceptual_encoder.latent_size


def test_tuple_fields():
    cfg = apply_overrides(
        get_config("hulc_debug"),
        [
            "action_decoder.perceptual_emb_slice=(0, 16)",
            "action_decoder.act_max_bound=[1, 1, 1, 1, 1, 1, 1]",
        ],
    )
    assert cfg.action_decoder.perceptual_emb_slice == (0, 16)
    assert cfg.action_decoder.act_max_bound == (1.0,) * 7
    assert all(isinstance(v, float) for v in cfg.action_decoder.act_max_bound)


def test_nested_tuple_of_tuples():
    cfg = apply_overrides(
        get_config("fetch_state_debug"),
        ["perceptual_encoder.proprio.keep_indices=((0, 3), (6, 7))",
         "perceptual_encoder.proprio.n_state_obs=4"],
    )
    assert cfg.perceptual_encoder.proprio.keep_indices == ((0, 3), (6, 7))


def test_unknown_field_lists_candidates():
    with pytest.raises(KeyError, match="hidden_size"):
        apply_overrides(get_config("hulc_debug"), ["action_decoder.hiden_size=96"])


def test_type_errors():
    with pytest.raises(TypeError, match="expected an int"):
        apply_overrides(get_config("hulc_debug"), ["action_decoder.hidden_size=big"])
    with pytest.raises(TypeError, match="not Optional"):
        apply_overrides(get_config("hulc_debug"), ["loss.kl_beta=none"])
    with pytest.raises(TypeError, match="config node"):
        apply_overrides(get_config("hulc_debug"), ["action_decoder=7"])
    with pytest.raises(ValueError, match="path.to.field=value"):
        apply_overrides(get_config("hulc_debug"), ["action_decoder.hidden_size"])
    with pytest.raises(TypeError, match="leaf field"):
        apply_overrides(get_config("hulc_debug"), ["loss.kl_beta.x=1"])


def test_overridden_config_still_builds_and_runs():
    import jax

    from hulc_tpu.models import example_batch, init_params, make_model

    cfg = apply_overrides(
        get_config("gcbc_debug"),
        ["action_decoder.hidden_size=48", "action_decoder.rnn_cell=gru"],
    )
    model = make_model(cfg)
    batch = {"vis": example_batch(cfg)}
    params = init_params(model, jax.random.key(0), batch)
    losses = model.apply(
        {"params": params}, jax.random.key(1), batch, 0.01,
        method=model.train_losses,
        rngs={"dropout": jax.random.key(2)},
    )
    assert "total_loss" in losses


def test_train_cli_accepts_set(tmp_path):
    from hulc_tpu.training.train import main as train_main

    state = train_main([
        "--config", "gcbc_debug", "--fixture", "--steps", "1",
        "--batch-size", "2", "--cache", "none",
        "--run-dir", str(tmp_path / "run"),
        "--set", "action_decoder.hidden_size=48",
        "--set", "loss.kl_beta=0.1",
    ])
    assert int(state.step) == 1


def test_presets_unchanged_by_override_round_trip():
    # apply_overrides returns a new config; the registry preset is untouched
    before = get_config("hulc_debug")
    apply_overrides(before, ["loss.kl_beta=0.5"])
    after = get_config("hulc_debug")
    assert dataclasses.asdict(before) == dataclasses.asdict(after)
