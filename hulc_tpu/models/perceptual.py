"""Multi-camera perceptual fusion (reference concat_encoders.py).

Input images arrive as normalized float NHWC sequences (B, S, H, W, C);
batch and time are flattened into one conv batch (B*S) so the MXU sees one
large convolution per camera per step — the dominant-FLOP path of the whole
model (SURVEY.md §3.1 hot loops).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.config import PerceptualEncoderConfig
from hulc_tpu.models.layers import MLP
from hulc_tpu.models.vision import make_vision_encoder

Array = jax.Array


class StateDecoder(nn.Module):
    """Proprio reconstruction aux head (reference state_decoder.py)."""

    n_state_obs: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return MLP([40, 40, self.n_state_obs], dtype=self.dtype, name="mlp")(x)


class ConcatEncoders(nn.Module):
    """Fuse per-camera CNN features (+ optional proprio) into perceptual_emb.

    __call__ takes a dict of (B, S, H, W, C) float images keyed like the
    reference batch schema (rgb_static, rgb_gripper, depth_static,
    depth_gripper, rgb_tactile) plus (B, S, n_state) proprio, and returns
    ((B, S, latent_size), visual_emb) — visual_emb retained for the optional
    state-reconstruction loss.
    """

    cfg: PerceptualEncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rgb_static_encoder = (
            make_vision_encoder(self.cfg.rgb_static, self.dtype, "rgb_static")
            if self.cfg.rgb_static
            else None
        )
        self.rgb_gripper_encoder = (
            make_vision_encoder(self.cfg.rgb_gripper, self.dtype, "rgb_gripper")
            if self.cfg.rgb_gripper
            else None
        )
        self.depth_static_encoder = (
            make_vision_encoder(self.cfg.depth_static, self.dtype, "depth_static")
            if self.cfg.depth_static
            else None
        )
        self.depth_gripper_encoder = (
            make_vision_encoder(self.cfg.depth_gripper, self.dtype, "depth_gripper")
            if self.cfg.depth_gripper
            else None
        )
        self.tactile_encoder = (
            make_vision_encoder(self.cfg.tactile, self.dtype, "tactile")
            if self.cfg.tactile
            else None
        )
        if self.cfg.use_state_decoder and self.cfg.proprio is not None:
            self.state_decoder = StateDecoder(self.cfg.proprio.n_state_obs, self.dtype)
        else:
            self.state_decoder = None

    def _encode(self, encoder, imgs: Array, deterministic: bool) -> Array:
        b, s = imgs.shape[:2]
        flat = imgs.reshape((b * s,) + imgs.shape[2:])
        if self.cfg.remat:
            # recompute the tower in the bwd instead of storing its conv/relu
            # intermediates (the step is HBM-bound; see config.remat note).
            # deterministic is static via the closure.
            run = nn.remat(lambda mdl, x: mdl(x, deterministic=deterministic))
            feats = run(encoder, flat)
        else:
            feats = encoder(flat, deterministic=deterministic)
        return feats.reshape(b, s, -1)

    def __call__(
        self,
        rgb_obs: Dict[str, Array],
        depth_obs: Dict[str, Array],
        robot_obs: Optional[Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        parts = []
        if self.rgb_static_encoder is not None and "rgb_static" in rgb_obs:
            parts.append(self._encode(self.rgb_static_encoder, rgb_obs["rgb_static"], deterministic))
        if self.depth_static_encoder is not None and "depth_static" in depth_obs:
            d = depth_obs["depth_static"]
            if d.ndim == 4:
                d = d[..., None]
            parts.append(self._encode(self.depth_static_encoder, d, deterministic))
        if self.rgb_gripper_encoder is not None and "rgb_gripper" in rgb_obs:
            parts.append(self._encode(self.rgb_gripper_encoder, rgb_obs["rgb_gripper"], deterministic))
            if self.depth_gripper_encoder is not None and "depth_gripper" in depth_obs:
                d = depth_obs["depth_gripper"]
                if d.ndim == 4:
                    d = d[..., None]
                parts.append(self._encode(self.depth_gripper_encoder, d, deterministic))
        if self.tactile_encoder is not None and "rgb_tactile" in rgb_obs:
            parts.append(self._encode(self.tactile_encoder, rgb_obs["rgb_tactile"], deterministic))

        if not parts:
            # state_only: no cameras at all — perceptual_emb is the proprio
            # passthrough (reference observation_space/state_only.yaml)
            if self.cfg.proprio is None or robot_obs is None:
                raise ValueError("camera-less perceptual encoder needs proprio input")
            b, s = robot_obs.shape[:2]
            visual_emb = jnp.zeros((b, s, 0), self.dtype)
            return robot_obs.astype(self.dtype), visual_emb
        visual_emb = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        if self.cfg.proprio is not None and robot_obs is not None:
            perceptual_emb = jnp.concatenate([visual_emb, robot_obs.astype(visual_emb.dtype)], -1)
        else:
            perceptual_emb = visual_emb
        return perceptual_emb, visual_emb

    def state_reconstruction_loss(self, visual_emb: Array, robot_obs: Array) -> Array:
        """MSE proprio reconstruction (reference concat_encoders.py:428-431)."""
        pred = self.state_decoder(visual_emb)
        return jnp.mean((robot_obs.astype(jnp.float32) - pred.astype(jnp.float32)) ** 2)
