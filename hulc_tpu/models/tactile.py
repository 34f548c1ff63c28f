"""Tactile encoder: ResNet18 feature extractor on 6-channel tactile images.

Reference behavior: hulc/models/perceptual_encoders/tactile_encoder.py —
a torchvision ResNet18 with the fc removed, frozen, on stacked 2x3-channel
tactile frames, followed by a trainable FC to visual_features. Without
torchvision in this environment the backbone is a from-scratch flax ResNet18
(standard architecture); ImageNet weights can be grafted via a converter if
provided locally.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.models.clip import FrozenBatchNorm

Array = jax.Array


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                      use_bias=False, dtype=dt, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, dt, name="bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, dt, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=dt, name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.planes, dt, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet18Features(nn.Module):
    """ResNet18 up to global average pool -> 512-d features."""

    in_conv_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        x = nn.Conv(self.in_conv_features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=dt, name="conv1")(x.astype(dt))
        x = nn.relu(FrozenBatchNorm(self.in_conv_features, dt, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (planes, blocks, stride) in enumerate(
            [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)]
        ):
            for bi in range(blocks):
                x = BasicBlock(planes, stride if bi == 0 else 1, dt, name=f"layer{li + 1}_{bi}")(x)
        # pool in fp32 (mean over H*W positions)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, 512)


def convert_torchvision_resnet18(state_dict) -> dict:
    """torchvision resnet18 state_dict -> params for :class:`ResNet18Features`.

    Accepts tensors or numpy arrays. The classifier head (``fc.*``) is
    dropped — the reference removes it too (tactile_encoder.py builds the
    backbone with the fc replaced). Conv kernels transpose OIHW -> HWIO;
    batch-norm running stats land in FrozenBatchNorm's mean/var params.

    Returns the param dict for the ``backbone`` module scope; graft with
    ``params["backbone"] = convert_torchvision_resnet18(sd)`` on an
    initialized TactileEncoder param tree.
    """
    import numpy as np

    def np_(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: np_(v) for k, v in state_dict.items()}

    def conv(prefix):
        return {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return {
            "scale": sd[prefix + ".weight"],
            "bias": sd[prefix + ".bias"],
            "mean": sd[prefix + ".running_mean"],
            "var": sd[prefix + ".running_var"],
        }

    out = {"conv1": conv("conv1"), "bn1": bn("bn1")}
    for li in range(1, 5):
        for bi in range(2):
            t = f"layer{li}.{bi}"
            block = {
                "conv1": conv(t + ".conv1"),
                "bn1": bn(t + ".bn1"),
                "conv2": conv(t + ".conv2"),
                "bn2": bn(t + ".bn2"),
            }
            if t + ".downsample.0.weight" in sd:
                block["downsample_conv"] = conv(t + ".downsample.0")
                block["downsample_bn"] = bn(t + ".downsample.1")
            out[f"layer{li}_{bi}"] = block
    return out


class TactileEncoder(nn.Module):
    """Frozen ResNet18 applied to left (ch 0:3) and right (ch 3:6) tactile
    frames with SHARED weights, features concatenated -> FC head
    (reference tactile_encoder.py:22-28)."""

    visual_features: int = 64
    freeze_backbone: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        backbone = ResNet18Features(dtype=self.dtype, name="backbone")
        feats = jnp.concatenate([backbone(x[..., :3]), backbone(x[..., 3:6])], axis=-1)
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        x = nn.relu(nn.Dense(512, dtype=self.dtype, name="fc1")(feats))
        return nn.Dense(self.visual_features, dtype=self.dtype, name="fc2")(x)
