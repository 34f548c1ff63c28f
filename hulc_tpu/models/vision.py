"""Per-camera CNN encoders (NHWC, bf16-friendly).

Reference behavior:
  * static cam: hulc/models/perceptual_encoders/vision_network.py — 3 convs
    (8/4, 4/2, 3/1, VALID), SpatialSoftmax keypoint pooling over the 64-ch
    feature map, FC 512 -> visual_features, LayerNorm.
  * gripper cam: vision_network_gripper.py nature_cnn — same convs, flatten,
    FC 3136 -> 128, then FC 512 -> visual_features, LayerNorm.

TPU-first: NHWC layout (native for TPU convolutions), compute dtype
configurable (bf16 convs hit the MXU), LayerNorm/softmax in fp32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.config import VisionEncoderConfig
from hulc_tpu.models.layers import ACTIVATIONS

Array = jax.Array


class SpatialSoftmax(nn.Module):
    """Expected (x, y) keypoint coordinates per channel.

    Mirrors reference vision_network.py:106-140: softmax over the flattened
    (H*W) map per channel, expectation against a [-1, 1] coordinate grid,
    output (..., 2*C) interleaved as (x_0, y_0, x_1, y_1, ...).
    """

    temperature: Optional[float] = 1.0  # None -> learnable parameter

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        if self.temperature is None:
            temp = self.param("temperature", nn.initializers.ones, (1,), jnp.float32)
        else:
            temp = jnp.asarray(self.temperature, jnp.float32)
        # Reference builds the grid with meshgrid(cols, rows, indexing="ij")
        # then flattens — x varies with the *row* index for square maps.
        lin_c = jnp.linspace(-1.0, 1.0, w)
        lin_r = jnp.linspace(-1.0, 1.0, h)
        x_map = jnp.repeat(lin_c, h)  # (w*h,) — matches reference layout
        y_map = jnp.tile(lin_r, w)

        flat = x.astype(jnp.float32).transpose(0, 3, 1, 2).reshape(n * c, h * w)
        attention = jax.nn.softmax(flat / temp, axis=1)
        expected_x = jnp.sum(x_map * attention, axis=1)
        expected_y = jnp.sum(y_map * attention, axis=1)
        coords = jnp.stack([expected_x, expected_y], axis=-1)  # (n*c, 2)
        return coords.reshape(n, c * 2)


class VisionNetworkStatic(nn.Module):
    """Static-camera encoder: convs + SpatialSoftmax + FC head."""

    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.cfg.activation]
        x = x.astype(self.dtype)
        x = act(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID", dtype=self.dtype, name="conv0")(x))
        x = act(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv1")(x))
        x = act(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID", dtype=self.dtype, name="conv2")(x))
        x = SpatialSoftmax(temperature=self.cfg.spatial_softmax_temp, name="spatial_softmax")(x)
        if self.cfg.use_sinusoid:
            x = jnp.concatenate([x, jnp.sin(x), jnp.cos(x)], axis=-1)
        x = act(nn.Dense(512, dtype=self.dtype, name="fc1")(x))
        if self.cfg.dropout > 0.0:
            x = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.cfg.visual_features, dtype=self.dtype, name="fc2")(x)
        if self.cfg.l2_normalize_output:
            x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


class NatureCNN(nn.Module):
    """Gripper-camera encoder: nature_cnn convs + flatten + FC head."""

    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.cfg.activation]
        x = x.astype(self.dtype)
        x = act(nn.Conv(32, (8, 8), strides=(4, 4), padding="VALID", dtype=self.dtype, name="conv0")(x))
        x = act(nn.Conv(64, (4, 4), strides=(2, 2), padding="VALID", dtype=self.dtype, name="conv1")(x))
        x = act(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID", dtype=self.dtype, name="conv2")(x))
        x = x.reshape(x.shape[0], -1)
        x = act(nn.Dense(128, dtype=self.dtype, name="fc0")(x))
        x = act(nn.Dense(512, dtype=self.dtype, name="fc1")(x))
        if self.cfg.dropout > 0.0:
            x = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.cfg.visual_features, dtype=self.dtype, name="fc2")(x)
        if self.cfg.l2_normalize_output:
            x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)


def make_vision_encoder(cfg: VisionEncoderConfig, dtype, name: str):
    if cfg.kind == "spatial_softmax":
        return VisionNetworkStatic(cfg, dtype, name=name)
    if cfg.kind == "nature_cnn":
        return NatureCNN(cfg, dtype, name=name)
    if cfg.kind == "clip":
        from hulc_tpu.models.clip import VisionClip

        return VisionClip(
            visual_features=cfg.visual_features, model_name=cfg.clip_model, name=name
        )
    if cfg.kind == "tactile":
        from hulc_tpu.models.tactile import TactileEncoder

        return TactileEncoder(visual_features=cfg.visual_features, name=name)
    raise ValueError(f"unknown vision encoder kind {cfg.kind!r}")
