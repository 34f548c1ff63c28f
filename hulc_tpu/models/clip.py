"""CLIP in flax: ViT + modified-ResNet image encoders, text transformer.

Reference behavior: the vendored OpenAI CLIP in
hulc/models/perceptual_encoders/clip.py (RN50 and ViT-B/32 backbones used by
the conf/model/perceptual_encoder/rgb_static/clip.yaml and
conf/model/language_encoder/clip_lang.yaml variants). Written fresh from the
public architecture; weights come from OpenAI checkpoints via
:func:`convert_openai_clip` (no network access is assumed — point it at a
downloaded ``.pt``).

HULC always freezes the backbone, so BatchNorm is implemented as a frozen
affine+running-stats transform and everything lives in ordinary params
(stop_gradient applied by the wrappers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with stored running stats (backbone is always frozen).

    The affine coefficients are derived in fp32 from the fp32 params, then
    cast to ``dtype`` so the (huge) feature-map multiply-add runs at the
    compute precision (bf16 on TPU: the f32 RN50 forward measured ~50 ms
    at B=8+8,S=16 vs ~5.7 ms for the flagship — round-3 profile).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + 1e-5) * scale
        return x * inv.astype(self.dtype) + (bias - mean * inv).astype(self.dtype)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN CLIP transformer block with QuickGELU."""

    d_model: int
    n_head: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(self.dtype)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x)
        mask = None
        if self.causal:
            s = x.shape[1]
            mask = jnp.tril(jnp.ones((1, 1, s, s), bool))
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, dtype=self.dtype, force_fp32_for_softmax=True,
            name="attn", deterministic=True,
        )(y.astype(self.dtype), y.astype(self.dtype), mask=mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        y = nn.Dense(4 * self.d_model, dtype=self.dtype, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.causal, self.dtype, name=f"resblock_{i}"
            )(x)
        return x


class CLIPVisionTransformer(nn.Module):
    """ViT image encoder (e.g. ViT-B/32: width 768, 12 layers, patch 32)."""

    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # x: (B, H, W, 3) normalized
        b = x.shape[0]
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x.astype(self.dtype))
        x = x.reshape(b, -1, self.width)  # (B, grid**2, width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], axis=1)
        n_pos = (self.input_resolution // self.patch_size) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.01), (n_pos, self.width))
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x)
        x = Transformer(self.width, self.layers, self.heads, dtype=self.dtype, name="transformer")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.02), (self.width, self.output_dim))
        return x.astype(jnp.float32) @ proj


class Bottleneck(nn.Module):
    """CLIP modified-ResNet bottleneck (avgpool instead of strided conv)."""

    inplanes: int
    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dt = self.dtype
        out = nn.relu(FrozenBatchNorm(self.planes, dt, name="bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, dtype=dt, name="conv1")(x)))
        out = nn.relu(FrozenBatchNorm(self.planes, dt, name="bn2")(
            nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        out = FrozenBatchNorm(self.planes * 4, dt, name="bn3")(
            nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=dt, name="conv3")(out))
        if self.stride > 1 or self.inplanes != self.planes * 4:
            sc = nn.avg_pool(x, (self.stride, self.stride), (self.stride, self.stride)) if self.stride > 1 else x
            sc = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=dt, name="downsample_conv")(sc)
            sc = FrozenBatchNorm(self.planes * 4, dt, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class AttentionPool2d(nn.Module):
    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        # mean in fp32 (1+HW positions), attention matmuls in compute dtype,
        # softmax in fp32 (design invariant)
        mean = x.astype(jnp.float32).mean(axis=1, keepdims=True)
        x = jnp.concatenate([mean.astype(x.dtype), x], axis=1)  # (B, 1+HW, C)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.spacial_dim**2 + 1, c)
        )
        x = x + pos[None].astype(x.dtype)
        q = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x[:, :1])
        k = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)
        hd = self.embed_dim // self.num_heads

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, hd)

        attn = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)).astype(jnp.float32) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, split(v)).reshape(b, 1, self.embed_dim)
        return nn.Dense(self.output_dim, dtype=jnp.float32, name="c_proj")(out)[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP RN50: 3-conv stem + avgpool, bottleneck layers, attention pool."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    output_dim: int = 1024
    heads: int = 32
    input_resolution: int = 224
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w, dt = self.width, self.dtype
        x = x.astype(dt)
        x = nn.relu(FrozenBatchNorm(w // 2, dt, name="bn1")(
            nn.Conv(w // 2, (3, 3), strides=(2, 2), padding=1, use_bias=False, dtype=dt, name="conv1")(x)))
        x = nn.relu(FrozenBatchNorm(w // 2, dt, name="bn2")(
            nn.Conv(w // 2, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv2")(x)))
        x = nn.relu(FrozenBatchNorm(w, dt, name="bn3")(
            nn.Conv(w, (3, 3), padding=1, use_bias=False, dtype=dt, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        inplanes = w
        for li, blocks in enumerate(self.layers):
            planes = w * (2**li)
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(
                    inplanes, planes, stride if bi == 0 else 1, dt, name=f"layer{li + 1}_{bi}"
                )(x)
                inplanes = planes * 4
        return AttentionPool2d(
            self.input_resolution // 32, w * 32, self.heads, self.output_dim, dtype=dt, name="attnpool"
        )(x)


class CLIPTextTransformer(nn.Module):
    """CLIP text encoder: causal pre-LN transformer over BPE tokens."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:  # (B, 77) int32
        emb = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width)
        )
        x = emb + pos[None, : tokens.shape[1]]
        x = Transformer(self.width, self.layers, self.heads, causal=True, dtype=self.dtype, name="transformer")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the highest token id
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.02), (self.width, self.output_dim))
        return x @ proj


CLIP_CONFIGS = {
    "RN50": dict(image="resnet", embed_dim=1024),
    "ViT-B/32": dict(image="vit", embed_dim=512, patch_size=32),
    "ViT-B/16": dict(image="vit", embed_dim=512, patch_size=16),
}

# ImageNet-style normalization CLIP applies (the clip.yaml transform set).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def make_image_encoder(model_name: str = "RN50", dtype: Any = jnp.float32) -> nn.Module:
    cfg = CLIP_CONFIGS[model_name]
    if cfg["image"] == "resnet":
        return ModifiedResNet(output_dim=cfg["embed_dim"], dtype=dtype)
    return CLIPVisionTransformer(patch_size=cfg["patch_size"], output_dim=cfg["embed_dim"], dtype=dtype)


def clip_preprocess(imgs: Array) -> Array:
    """uint8 (..., H, W, 3) at 224px -> CLIP-normalized float."""
    x = imgs.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


class VisionClip(nn.Module):
    """Frozen CLIP image features + 2 trainable FC (vision_clip.py)."""

    visual_features: int = 64
    model_name: str = "RN50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        feats = make_image_encoder(self.model_name, dtype=self.dtype)(x)
        feats = jax.lax.stop_gradient(feats)  # frozen backbone
        hidden = 512 if "RN50" in self.model_name else 256
        x = nn.relu(nn.Dense(hidden, dtype=self.dtype, name="fc1")(feats))
        return nn.Dense(self.visual_features, dtype=self.dtype, name="fc2")(x)


class LangClip(nn.Module):
    """Frozen CLIP text encoder (clip_lang_encoder.py)."""

    model_name: str = "RN50"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        emb = CLIPTextTransformer(
            output_dim=CLIP_CONFIGS[self.model_name]["embed_dim"], dtype=self.dtype
        )(tokens)
        return jax.lax.stop_gradient(emb)[:, None, :]  # (B, 1, D) like reference


# --------------------------------------------------------------------------
# OpenAI checkpoint conversion
# --------------------------------------------------------------------------


def convert_openai_clip(
    state_dict: Dict[str, Any],
    model_name: str = "RN50",
    text_heads: Optional[int] = None,
    visual_heads: Optional[int] = None,
) -> Dict[str, Any]:
    """OpenAI CLIP state_dict -> params for the modules above.

    Returns {"visual": ..., "text": ...}. Works on the fp32 state_dict of
    the public .pt archives (torch.jit archive state_dict or plain dict).
    """

    def np_(x):
        return x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)

    sd = {k: np_(v) for k, v in state_dict.items()}

    def linear(p):
        return {"kernel": sd[f"{p}.weight"].T, "bias": sd[f"{p}.bias"]}

    def ln(p):
        return {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}

    def bn(p):
        return {
            "scale": sd[f"{p}.weight"],
            "bias": sd[f"{p}.bias"],
            "mean": sd[f"{p}.running_mean"],
            "var": sd[f"{p}.running_var"],
        }

    def conv(p, bias=False):
        out = {"kernel": sd[f"{p}.weight"].transpose(2, 3, 1, 0)}
        if bias:
            out["bias"] = sd[f"{p}.bias"]
        return out

    def attention(p, d_model, heads):
        head_dim = d_model // heads
        wq, wk, wv = np.split(sd[f"{p}.in_proj_weight"], 3, axis=0)
        bq, bk, bv = np.split(sd[f"{p}.in_proj_bias"], 3, axis=0)

        def qkv(w, b):
            return {"kernel": w.T.reshape(d_model, heads, head_dim), "bias": b.reshape(heads, head_dim)}

        return {
            "query": qkv(wq, bq),
            "key": qkv(wk, bk),
            "value": qkv(wv, bv),
            "out": {
                "kernel": sd[f"{p}.out_proj.weight"].T.reshape(heads, head_dim, d_model),
                "bias": sd[f"{p}.out_proj.bias"],
            },
        }

    def resblocks(prefix, width, heads, n):
        out = {}
        for i in range(n):
            p = f"{prefix}.resblocks.{i}"
            out[f"resblock_{i}"] = {
                "ln_1": ln(f"{p}.ln_1"),
                "ln_2": ln(f"{p}.ln_2"),
                "attn": attention(f"{p}.attn", width, heads),
                "c_fc": linear(f"{p}.mlp.c_fc"),
                "c_proj": linear(f"{p}.mlp.c_proj"),
            }
        return out

    # ---- text tower -----------------------------------------------------
    t_width = sd["ln_final.weight"].shape[0]
    t_layers = len({k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")})
    t_heads = text_heads or max(1, t_width // 64)  # real CLIP: 64 dims/head
    text = {
        "token_embedding": {"embedding": sd["token_embedding.weight"]},
        "positional_embedding": sd["positional_embedding"],
        "transformer": resblocks("transformer", t_width, t_heads, t_layers),
        "ln_final": ln("ln_final"),
        "text_projection": sd["text_projection"],
    }

    # ---- visual tower ---------------------------------------------------
    if "visual.proj" in sd:  # ViT
        v_width = sd["visual.ln_post.weight"].shape[0]
        v_layers = len({k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks")})
        visual = {
            "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
            "class_embedding": sd["visual.class_embedding"],
            "positional_embedding": sd["visual.positional_embedding"],
            "ln_pre": ln("visual.ln_pre"),
            "transformer": resblocks("visual.transformer", v_width, visual_heads or max(1, v_width // 64), v_layers),
            "ln_post": ln("visual.ln_post"),
            "proj": sd["visual.proj"],
        }
    else:  # ModifiedResNet
        visual = {
            "conv1": conv("visual.conv1"),
            "conv2": conv("visual.conv2"),
            "conv3": conv("visual.conv3"),
            "bn1": bn("visual.bn1"),
            "bn2": bn("visual.bn2"),
            "bn3": bn("visual.bn3"),
        }
        counts = [3, 4, 6, 3]
        for li, blocks in enumerate(counts):
            for bi in range(blocks):
                p = f"visual.layer{li + 1}.{bi}"
                blk = {
                    "conv1": conv(f"{p}.conv1"),
                    "conv2": conv(f"{p}.conv2"),
                    "conv3": conv(f"{p}.conv3"),
                    "bn1": bn(f"{p}.bn1"),
                    "bn2": bn(f"{p}.bn2"),
                    "bn3": bn(f"{p}.bn3"),
                }
                # downsample = Sequential("-1": AvgPool, "0": Conv, "1": BN)
                if f"{p}.downsample.0.weight" in sd:
                    blk["downsample_conv"] = conv(f"{p}.downsample.0")
                    blk["downsample_bn"] = bn(f"{p}.downsample.1")
                visual[f"layer{li + 1}_{bi}"] = blk
        ap = "visual.attnpool"
        visual["attnpool"] = {
            "positional_embedding": sd[f"{ap}.positional_embedding"],
            "q_proj": linear(f"{ap}.q_proj"),
            "k_proj": linear(f"{ap}.k_proj"),
            "v_proj": linear(f"{ap}.v_proj"),
            "c_proj": linear(f"{ap}.c_proj"),
        }
    return {"visual": visual, "text": text}
