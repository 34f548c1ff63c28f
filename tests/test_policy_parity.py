"""Policy-level golden parity: a full closed-loop inference step (replan +
sequential act with carry) through converted weights must match the
reference modules composed exactly as Hulc.step() composes them
(hulc.py:851-957): encode obs -> lang goal -> proposal plan (deterministic
mode) -> RNN decoder steps with persistent hidden state.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from hulc_tpu.config import get_config
from hulc_tpu.models.decoders import decoder_carry
from hulc_tpu.models import make_model
from tests.test_torch_parity import CFG, converted, ref, torch_modules  # fixtures  # noqa: F401


def test_closed_loop_act_with_carry_matches_reference(torch_modules, converted):  # noqa: F811
    """Three sequential single-frame decoder act() calls with carry must
    equal the reference decoder stepping with self.hidden_state."""
    rng = np.random.default_rng(7)
    plan = rng.normal(size=(1, 1024)).astype(np.float32)
    goal = rng.normal(size=(1, 32)).astype(np.float32)
    frames = rng.normal(size=(3, 1, 1, 128)).astype(np.float32)

    t = torch_modules.action_decoder
    t.clear_hidden_state()
    torch_means = []
    with torch.no_grad():
        for k in range(3):
            # reference act() keeps hidden state across calls
            lp, ls, mu, grip, t.hidden_state = t(
                torch.from_numpy(plan), torch.from_numpy(frames[k]),
                torch.from_numpy(goal), t.hidden_state,
            )
            torch_means.append(mu.numpy())

    from hulc_tpu.models.decoders import LogisticPolicyDecoder

    mod = LogisticPolicyDecoder(CFG.action_decoder)
    carry = decoder_carry(CFG.action_decoder, 1)
    for k in range(3):
        out = mod.apply(
            {"params": converted["action_decoder"]},
            jnp.asarray(plan), jnp.asarray(frames[k]), jnp.asarray(goal), carry,
        )
        carry = out.carry
        np.testing.assert_allclose(
            np.asarray(out.means), torch_means[k], atol=2e-3, rtol=1e-3,
            err_msg=f"step {k} diverged",
        )


def test_full_policy_step_pipeline(torch_modules, converted):  # noqa: F811
    """End-to-end replan path: obs encode -> lang goal -> proposal logits,
    composed through OUR HulcPolicy-jitted functions vs torch modules."""
    from hulc_tpu.data.dataset import DatasetStatistics
    from hulc_tpu.evaluation.policy import HulcPolicy
    from hulc_tpu.models import example_batch, init_params

    model = make_model(CFG)
    batch = {"vis": example_batch(CFG, 1, 2), "lang": example_batch(CFG, 1, 2, lang=True)}
    full = init_params(model, jax.random.key(0), batch)
    for k, v in converted.items():
        full[k] = jax.tree.map(jnp.asarray, v)

    rng = np.random.default_rng(8)
    img_static = rng.integers(0, 255, (200, 200, 3), np.uint8)
    img_gripper = rng.integers(0, 255, (84, 84, 3), np.uint8)
    robot_obs = rng.normal(size=15).astype(np.float32)
    lang_emb = rng.normal(size=384).astype(np.float32)
    obs = {
        "rgb_obs": {"rgb_static": img_static, "rgb_gripper": img_gripper},
        "depth_obs": {},
        "robot_obs": robot_obs,
    }
    policy = HulcPolicy(CFG, full, statistics=None)
    policy.reset()
    action = policy.step(obs, lang_emb)
    assert action.shape == (7,) and np.isfinite(action).all()

    # torch side: same preprocessing ((x/255 - .5)/.5), same composition
    def prep(img):
        x = img.astype(np.float32) / 255.0
        return ((x - 0.5) / 0.5).transpose(2, 0, 1)[None]

    with torch.no_grad():
        t_static = torch_modules.vis_static(torch.from_numpy(prep(img_static)))
        t_gripper = torch_modules.vis_gripper(torch.from_numpy(prep(img_gripper)))
        t_emb = torch.cat([t_static, t_gripper], dim=-1)[None]  # (1, 1, 128)
        t_goal = torch_modules.language_goal(torch.from_numpy(lang_emb[None]))
        t_pp = torch_modules.plan_proposal(t_emb[:, 0], t_goal)

    # our jitted replan path produces the same latent goal + proposal logits
    rgb_s = img_static[None, None]
    rgb_g = img_gripper[None, None]
    rob_norm = policy._split_obs(obs)[2]
    emb = policy._replan_lang.__wrapped__(
        full, jax.random.key(0), rgb_s, rgb_g, rob_norm, jnp.asarray(lang_emb[None])
    )
    # __wrapped__ returns (plan, latent_goal); compare latent goal
    np.testing.assert_allclose(np.asarray(emb[1]), t_goal.numpy(), atol=5e-4)

    # proposal logits via model method on the same perceptual emb
    from hulc_tpu.models.hulc import ModalityBatch
    from hulc_tpu.ops.image_ops import preprocess_rgb_seq

    mb = ModalityBatch(
        rgb_static=preprocess_rgb_seq(jnp.asarray(rgb_s)),
        rgb_gripper=preprocess_rgb_seq(jnp.asarray(rgb_g)),
        robot_obs=jnp.asarray(rob_norm),
        actions=jnp.zeros((1, 1, 7)),
        state_info_robot_obs=jnp.zeros((1, 1, 15)),
    )
    our_emb, _ = model.apply({"params": full}, mb, method=model.encode)
    np.testing.assert_allclose(np.asarray(our_emb[0]), t_emb[0].numpy(), atol=5e-4)
    state = model.apply(
        {"params": full}, our_emb[:, 0], np.asarray(emb[1]),
        method=lambda m, e, g: m.plan_proposal(e, g),
    )
    np.testing.assert_allclose(np.asarray(state.logit), t_pp.logit.numpy(), atol=5e-3)
