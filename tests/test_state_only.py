"""state_only observation space: no cameras, proprio passthrough only.

Reference: conf/datamodule/observation_space/state_only.yaml (rgb_obs [] /
depth_obs [] / state_obs [robot_obs]) — the camera-less ablation the conf
tree expresses. Covers config resolution, the loader (no image keys read at
all), the train step (direct + fused), val metrics, and the closed-loop
policy (sequential + batched), all with ModalityBatch.rgb_static=None.
"""

import jax
import numpy as np
import pytest

from hulc_tpu.config import get_config
from hulc_tpu.data.fixtures import make_fixture_dataset
from hulc_tpu.data.loader import make_loaders
from hulc_tpu.evaluation.fake_env import FakeCalvinEnv, fake_env_for
from hulc_tpu.evaluation.policy import HulcPolicy
from hulc_tpu.models import example_batch, init_params, make_model
from hulc_tpu.training.trainer import Trainer, TrainerConfig


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return make_fixture_dataset(tmp_path_factory.mktemp("calvin_so"), num_episodes=2, episode_len=48)


@pytest.fixture(scope="module")
def cfg():
    return get_config("state_only_debug")


def test_state_only_config_resolves(cfg):
    assert cfg.perceptual_encoder.rgb_static is None
    assert cfg.perceptual_encoder.rgb_gripper is None
    assert cfg.perceptual_encoder.proprio is not None
    # perceptual_emb == the 8-d proprio passthrough
    assert cfg.perceptual_encoder.latent_size == cfg.perceptual_encoder.proprio.n_state_obs
    assert cfg.action_decoder.perceptual_features == cfg.perceptual_encoder.latent_size


def test_state_only_latent_size_guard():
    import dataclasses

    from hulc_tpu.config import PerceptualEncoderConfig

    empty = PerceptualEncoderConfig(rgb_static=None, rgb_gripper=None, proprio=None)
    with pytest.raises(ValueError, match="at least one camera or proprio"):
        _ = empty.latent_size


def test_state_only_loader_skips_images(cfg, fixture_root):
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    batch = next(iter(loader))
    mod = batch[next(iter(batch))]
    assert mod.rgb_static is None and mod.rgb_gripper is None
    assert mod.robot_obs.shape[-1] == cfg.perceptual_encoder.proprio.n_state_obs
    # no image key was even read from disk
    for l in loader.loaders.values():
        assert "rgb_static" not in l.store.keys


def test_state_only_train_and_val(cfg, fixture_root, tmp_path):
    tcfg = TrainerConfig(
        run_dir=str(tmp_path / "run"), max_epochs=1, log_every=1000,
        donate_state=False, num_devices=2,
    )
    trainer = Trainer(cfg, tcfg)
    loader = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8, cache="none")
    val = make_loaders(cfg, fixture_root, batch_size=2, min_window=8, max_window=8,
                       cache="none", deterministic=True)
    state = trainer.fit(loader, val, max_epochs=1, max_steps=2, resume=False)
    assert int(state.step) == 2
    metrics = trainer.validate(state, val, jax.random.key(5), max_batches=1)
    assert np.isfinite(metrics["action_loss_pp"])


def test_state_only_fused_loader_matches_schema(cfg, fixture_root):
    """fuse=True stacks [vis; lang] with rgb_static staying None throughout."""
    loader = make_loaders(
        cfg, fixture_root, batch_size=2, min_window=8, max_window=8,
        cache="none", fuse=True,
    )
    batch = next(iter(loader))
    assert set(batch) == {"fused"}
    fused = batch["fused"]
    assert fused.rgb_static is None
    assert fused.actions.shape[0] == 4  # 2B rows
    assert fused.lang is not None and fused.lang.shape[0] == 2

    model = make_model(cfg)
    params = init_params(
        model, jax.random.key(0),
        {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)},
    )
    from hulc_tpu.training.preprocess import preprocess_batch

    prepped = preprocess_batch(cfg, batch, jax.random.key(1), train=True)
    losses = model.apply(
        {"params": params}, jax.random.key(2), prepped, 0.01,
        method=model.train_losses, rngs={"dropout": jax.random.key(3)},
    )
    assert np.isfinite(losses["total_loss"])


def test_state_only_policy_closed_loop(cfg):
    model = make_model(cfg)
    params = init_params(
        model, jax.random.key(0),
        {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)},
    )
    lang_embeddings = {"open_drawer": np.zeros(384, np.float32)}
    policy = HulcPolicy(cfg, params, lang_embeddings=lang_embeddings)
    env = fake_env_for(cfg)
    obs = env.reset()
    policy.reset()
    a1 = policy.step(obs, "open_drawer")
    assert a1.shape == (7,) and np.isfinite(a1).all()
    a2 = policy.step(env.step(a1), "open_drawer")
    assert a2.shape == (7,)
    # visual-goal replanning works off the proprio goal frame
    policy.reset()
    a3 = policy.step(env.get_obs(), env.get_obs())
    assert a3.shape == (7,) and np.isfinite(a3).all()


def test_state_only_batched_policy(cfg):
    from hulc_tpu.evaluation.batched_eval import BatchedHulcPolicy

    model = make_model(cfg)
    params = init_params(
        model, jax.random.key(0),
        {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)},
    )
    pol = BatchedHulcPolicy(cfg, params, num_envs=3)
    envs = [FakeCalvinEnv(seed=i) for i in range(3)]
    obs = [e.reset() for e in envs]
    state = pol.initial_state()
    lang = np.zeros((3, 384), np.float32)
    actions, state = pol.step(obs, lang, state, np.ones(3, bool))
    assert actions.shape == (3, 7) and np.isfinite(actions).all()
    actions2, _ = pol.step([e.step(a) for e, a in zip(envs, actions)], lang, state, np.zeros(3, bool))
    assert actions2.shape == (3, 7)


def test_robot_scene_policy_closed_loop():
    """robot_scene proprioception end-to-end in the closed loop: the policy
    pulls scene_obs from the env obs and normalizes it like the loader."""
    import dataclasses

    from hulc_tpu.config import ProprioConfig

    base = get_config("gcbc_debug")
    pe = dataclasses.replace(
        base.perceptual_encoder,
        proprio=ProprioConfig(n_state_obs=39, keep_indices=((0, 39),), include_scene=True),
    )
    cfg = get_config("gcbc_debug", perceptual_encoder=pe)
    model = make_model(cfg)
    params = init_params(
        model, jax.random.key(0),
        {"vis": example_batch(cfg), "lang": example_batch(cfg, lang=True)},
    )
    policy = HulcPolicy(cfg, params, lang_embeddings={"open_drawer": np.zeros(384, np.float32)})
    env = fake_env_for(cfg)
    obs = env.reset()
    assert "scene_obs" in obs
    policy.reset()
    a = policy.step(obs, "open_drawer")
    assert a.shape == (7,) and np.isfinite(a).all()
    # missing scene_obs must fail loudly, not silently misfeed the encoder
    obs_no_scene = {k: v for k, v in obs.items() if k != "scene_obs"}
    policy.reset()
    with pytest.raises(ValueError, match="scene_obs"):
        policy.step(obs_no_scene, "open_drawer")
