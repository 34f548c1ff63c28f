"""Closed-loop inference policy: the CalvinBaseModel contract, jitted.

Reference behavior: Hulc.reset()/step(obs, goal) with replanning every
``replan_freq`` env steps (hulc.py:843-957) and GCBC's plan-free variant
(gcbc.py:283-317).

TPU-first redesign: the reference hides closed-loop state in module
attributes (decoder hidden state, cached plan/goal, step counter). Here all
of it lives in an explicit :class:`PolicyState` pytree; the two jitted
device functions are

  * ``_replan``: encode current obs (+ goal image or language embedding) ->
    sample plan from the proposal prior, reset decoder carry;
  * ``_act``: encode obs -> one decoder step with carry -> world-frame
    action.

Both compile once (static single-frame shapes) and stay resident on the
chip; the host only moves one frame of uint8 pixels per env step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hulc_tpu.config import HulcConfig
from hulc_tpu.data.dataset import DatasetStatistics
from hulc_tpu.models import make_model
from hulc_tpu.models.decoders import decoder_carry
from hulc_tpu.models.hulc import ModalityBatch
from hulc_tpu.ops.image_ops import preprocess_rgb_seq


class PolicyState(NamedTuple):
    plan: jax.Array
    latent_goal: jax.Array
    carry: Any
    step_count: int
    rng: jax.Array


def _keep_indices(robot_obs, keep=((0, 7), (14, 15))):
    return np.concatenate([robot_obs[..., a:b] for a, b in keep], axis=-1)


def proprio_settings(cfg):
    """(keep_indices, normalize) matching the training loader (loader.py)."""
    p = cfg.perceptual_encoder.proprio
    if p is not None:
        return tuple(p.keep_indices), p.normalize
    return ((0, 7), (14, 15)), True


class StateObsNormalizer:
    """obs -> the proprio vector the training loader feeds (loader.py).

    Handles every proprioception_dims preset: keep_indices slicing,
    normalization with dataset statistics, and robot_scene
    (``include_scene=True``: the state vector is [robot_obs(15);
    scene_obs(24)], each normalized with its own statistics, BEFORE
    slicing — the env obs must then carry ``scene_obs``).
    """

    def __init__(self, cfg, statistics):
        p = cfg.perceptual_encoder.proprio
        self.keep, self.normalize = proprio_settings(cfg)
        self.include_scene = bool(p.include_scene) if p is not None else False
        stats = statistics
        self.rob_mean = stats.robot_obs_mean if stats else np.zeros(15, np.float32)
        self.rob_std = stats.robot_obs_std if stats else np.ones(15, np.float32)
        self.scene_mean = (
            getattr(stats, "scene_obs_mean", None) if stats else None
        )
        self.scene_std = getattr(stats, "scene_obs_std", None) if stats else None
        if self.scene_mean is None:
            self.scene_mean, self.scene_std = np.zeros(24, np.float32), np.ones(24, np.float32)

    def __call__(self, rob_raw: np.ndarray, scene_raw=None) -> np.ndarray:
        """rob_raw (..., 15), scene_raw (..., 24) -> kept proprio (..., k)."""

        def norm(x, mean, std):
            return (x - mean) / np.maximum(std, 1e-6) if self.normalize else x

        state = norm(rob_raw, self.rob_mean, self.rob_std)
        if self.include_scene:
            if scene_raw is None:
                raise ValueError(
                    "proprio.include_scene=True needs scene_obs in the env obs"
                )
            state = np.concatenate(
                [state, norm(scene_raw, self.scene_mean, self.scene_std)], axis=-1
            )
        return _keep_indices(state, self.keep).astype(np.float32)


def build_policy_fns(model, cfg: HulcConfig):
    """Pure closed-loop device functions, shared by :class:`HulcPolicy` and
    the serving exporter (serving/export.py).

    All three are batch-size parametric on the leading dim of
    ``robot_obs_norm`` (single-lane inference passes 1) and take params as
    the first argument so they jit/export cleanly.
    """

    def _prep(img):
        return preprocess_rgb_seq(img, None, 0) if img is not None else None

    def _encode_frame(params, rgb_static, rgb_gripper, robot_obs_norm):
        """(E, S, ...) preprocessed frames -> perceptual_emb (E, S, F)."""
        e, s = robot_obs_norm.shape[:2]
        batch = ModalityBatch(
            rgb_static=rgb_static,
            rgb_gripper=rgb_gripper,
            robot_obs=robot_obs_norm,
            actions=jnp.zeros((e, s, 7)),
            state_info_robot_obs=jnp.zeros((e, s, 15)),
        )
        emb, _ = model.apply({"params": params}, batch, method=model.encode)
        return emb

    def replan_lang(params, rng, rgb_static, rgb_gripper, robot_obs_norm, lang_emb):
        emb = _encode_frame(params, _prep(rgb_static), _prep(rgb_gripper), robot_obs_norm)
        latent_goal = model.apply(
            {"params": params}, lang_emb, method=model.encode_language_goal
        )
        plan = model.apply(
            {"params": params}, rng, emb, latent_goal, method=model.propose_plan
        )
        return plan, latent_goal

    def replan_vision(params, rng, rgb_static2, rgb_gripper2, robot_obs_norm2):
        """Current + goal frame stacked on the seq axis (hulc.py:910-935)."""
        emb = _encode_frame(params, _prep(rgb_static2), _prep(rgb_gripper2), robot_obs_norm2)
        latent_goal = model.apply(
            {"params": params}, emb[:, -1], method=model.encode_visual_goal
        )
        plan = model.apply(
            {"params": params}, rng, emb[:, :1], latent_goal, method=model.propose_plan
        )
        return plan, latent_goal

    def act(params, rng, plan, latent_goal, rgb_static, rgb_gripper, robot_obs_norm, robot_obs_raw, carry):
        emb = _encode_frame(params, _prep(rgb_static), _prep(rgb_gripper), robot_obs_norm)
        action, new_carry = model.apply(
            {"params": params},
            rng,
            plan,
            emb,
            latent_goal,
            robot_obs_raw,
            carry,
            method=model.decoder_act,
        )
        return action[:, 0], new_carry

    return replan_lang, replan_vision, act


class HulcPolicy:
    """reset()/step(obs, goal) driving the jitted model."""

    def __init__(
        self,
        cfg: HulcConfig,
        params,
        statistics: Optional[DatasetStatistics] = None,
        lang_embeddings: Optional[Dict[str, np.ndarray]] = None,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.model = make_model(cfg)
        self.params = params
        self.replan_freq = cfg.replan_freq
        self.lang_embeddings = lang_embeddings or {}
        self._state_norm = StateObsNormalizer(cfg, statistics)
        self._state: Optional[PolicyState] = None
        self._base_rng = jax.random.key(seed)

        replan_lang, replan_vision, act = build_policy_fns(self.model, cfg)
        self._replan_lang = jax.jit(replan_lang)
        self._replan_vision = jax.jit(replan_vision)
        self._act = jax.jit(act)

    # ------------------------------------------------------------------
    # CalvinBaseModel contract
    # ------------------------------------------------------------------

    def reset(self) -> None:
        self._state = None

    def load_lang_embeddings(self, embeddings_path) -> None:
        """Map instruction strings -> precomputed embeddings (hulc.py:874)."""
        embeddings = np.load(embeddings_path, allow_pickle=True).item()
        self.lang_embeddings = {v["ann"][0]: np.asarray(v["emb"]).reshape(-1) for v in embeddings.values()}

    def step(self, obs: Dict, goal) -> np.ndarray:
        """One env step. goal: instruction str, embedding array, or goal-obs dict."""
        rgb_static, rgb_gripper, rob_norm, rob_raw = self._split_obs(obs)
        state = self._state
        if state is None or state.step_count % self.replan_freq == 0:
            rng, k = jax.random.split(state.rng if state else self._base_rng)
            if isinstance(goal, str) or isinstance(goal, (np.ndarray, jnp.ndarray)):
                if isinstance(goal, str):
                    emb = self.lang_embeddings[goal]
                else:
                    emb = np.asarray(goal)
                plan, latent_goal = self._replan_lang(
                    self.params, k, rgb_static, rgb_gripper, rob_norm,
                    jnp.asarray(emb, jnp.float32).reshape(1, -1),
                )
            else:
                g_static, g_gripper, g_norm, _ = self._split_obs(goal)

                def _cat_seq(a, b):
                    return np.concatenate([a, b], axis=1) if a is not None else None

                plan, latent_goal = self._replan_vision(
                    self.params,
                    k,
                    _cat_seq(rgb_static, g_static),
                    _cat_seq(rgb_gripper, g_gripper),
                    np.concatenate([rob_norm, g_norm], axis=1),
                )
            carry = decoder_carry(self.cfg.action_decoder, 1)
            state = PolicyState(plan, latent_goal, carry, state.step_count if state else 0, rng)

        rng, k_act = jax.random.split(state.rng)
        action, carry = self._act(
            self.params, k_act, state.plan, state.latent_goal,
            rgb_static, rgb_gripper, rob_norm, rob_raw, state.carry,
        )
        self._state = PolicyState(state.plan, state.latent_goal, carry, state.step_count + 1, rng)
        return np.asarray(action[0])

    # ------------------------------------------------------------------

    def _split_obs(self, obs: Dict):
        # cameras the config doesn't consume stay on the host (state_only:
        # no pixels cross the wire at all)
        pe = self.cfg.perceptual_encoder
        rgb = obs.get("rgb_obs", {})
        rgb_static = (
            np.asarray(rgb["rgb_static"])[None, None] if pe.rgb_static is not None else None
        )  # (1,1,H,W,3)
        rgb_gripper = (
            np.asarray(rgb["rgb_gripper"])[None, None] if pe.rgb_gripper is not None else None
        )
        rob_raw = np.asarray(obs["robot_obs"], np.float32).reshape(1, 1, 15)
        scene_raw = (
            np.asarray(obs["scene_obs"], np.float32).reshape(1, 1, -1)
            if self._state_norm.include_scene and "scene_obs" in obs
            else None
        )
        rob_norm = self._state_norm(rob_raw, scene_raw)
        return rgb_static, rgb_gripper, rob_norm, rob_raw
