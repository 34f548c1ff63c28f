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
        # The reference's grid (meshgrid(cols, rows) + repeat/tile) only makes
        # sense for square maps, and the NHWC-direct contraction below indexes
        # x by the row axis to reproduce that quirk — reject non-square maps
        # loudly instead of silently swapping axis lengths.
        if h != w:
            raise ValueError(
                f"SpatialSoftmax requires a square feature map (got {h}x{w}); "
                "the reference's coordinate grid (vision_network.py:120-131) is "
                "square-only and this implementation mirrors its row/col quirk."
            )
        if self.temperature is None:
            temp = self.param("temperature", nn.initializers.ones, (1,), jnp.float32)
        else:
            temp = jnp.asarray(self.temperature, jnp.float32)
        # Reference builds the grid with meshgrid(cols, rows, indexing="ij")
        # then flattens — x varies with the *row* index for square maps.
        lin_c = jnp.linspace(-1.0, 1.0, w)
        lin_r = jnp.linspace(-1.0, 1.0, h)

        # Softmax-expectation computed directly on the NHWC map: the earlier
        # transpose-to-(N*C, H*W) formulation materialized dozens of fp32
        # copies of the conv feature map in fwd+bwd (the single biggest HBM
        # consumer of the train step, diagnosed round 2). Reductions run in
        # fp32 (exp/sum accumulators); no layout change, so XLA keeps the
        # whole thing in reduce fusions over the conv output.
        z = x.astype(jnp.float32) / temp
        m = jax.lax.stop_gradient(jnp.max(z, axis=(1, 2), keepdims=True))
        e = jnp.exp(z - m)  # (n, h, w, c)
        s = jnp.sum(e, axis=(1, 2))  # (n, c)
        # x-coordinate indexes the row axis (reference repeat/tile quirk for
        # square maps, vision_network.py:120-131)
        expected_x = jnp.einsum("nhwc,h->nc", e, lin_c) / s
        expected_y = jnp.einsum("nhwc,w->nc", e, lin_r) / s
        coords = jnp.stack([expected_x, expected_y], axis=-1)  # (n, c, 2)
        return coords.reshape(n, c * 2)


class SpaceToDepthConv(nn.Module):
    """8x8/stride-4 VALID conv computed as a 2x2/stride-1 conv over a
    4x4-space-to-depth input (the MLPerf TPU trick for small-channel first
    convs). Bit-identical math — same dot-product terms, just regrouped —
    but the contraction dim grows 3 -> 48, which fixes the catastrophic MXU
    utilization of the direct form (conv0 fwd+wgrad was ~6 ms of the 28 ms
    bench step; diagnosed round 2). The parameter keeps the logical
    (8, 8, C, F) layout so checkpoints/converters/parity are unaffected.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    mode: str = "w"  # "w" | "hw" | "none"

    BLOCK = 4
    KERNEL = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, h, w, c = x.shape
        k, b4 = self.KERNEL, self.BLOCK
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mode = self.mode
        if (mode == "hw" and (h % b4 or w % b4)) or (mode == "w" and w % b4):
            mode = "none"
        if mode == "w":
            # width-only space-to-depth: (w, c) are the two minor dims, so
            # grouping w into blocks of 4 is a PURE reshape — no transpose,
            # no relayout copy (the full 4x4 s2d needs an (u,a,v,b)->(u,v,a,b)
            # transpose that XLA lowers to ~2.5 ms of copies per camera at
            # the bench batch). Channels grow 3 -> 12; kernel (8,8,3,F)
            # reshapes to (8,2,12,F) the same way; stride (4,1).
            xs = x.reshape(n, h, w // b4, b4 * c)
            ks = kernel.reshape(k, k // b4, b4 * c, self.features)
            y = jax.lax.conv_general_dilated(
                xs.astype(self.dtype), ks.astype(self.dtype), (b4, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        if mode == "hw":
            xs = (
                x.reshape(n, h // b4, b4, w // b4, b4, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(n, h // b4, w // b4, b4 * b4 * c)
            )
            ks = (
                kernel.reshape(k // b4, b4, k // b4, b4, c, self.features)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(k // b4, k // b4, b4 * b4 * c, self.features)
            )
            y = jax.lax.conv_general_dilated(
                xs.astype(self.dtype), ks.astype(self.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (b4, b4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class VisionNetworkStatic(nn.Module):
    """Static-camera encoder: convs + SpatialSoftmax + FC head."""

    cfg: VisionEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.cfg.activation]
        x = x.astype(self.dtype)
        x = act(SpaceToDepthConv(32, dtype=self.dtype, name="conv0")(x))
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
        x = act(SpaceToDepthConv(32, dtype=self.dtype, name="conv0")(x))
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
            visual_features=cfg.visual_features, model_name=cfg.clip_model,
            dtype=dtype, name=name,
        )
    if cfg.kind == "tactile":
        from hulc_tpu.models.tactile import TactileEncoder

        return TactileEncoder(visual_features=cfg.visual_features, dtype=dtype, name=name)
    raise ValueError(f"unknown vision encoder kind {cfg.kind!r}")
