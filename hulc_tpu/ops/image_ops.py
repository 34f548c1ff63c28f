"""On-device image preprocessing and augmentation (NHWC, TPU-first).

Replaces the reference's per-sample CPU dataloader transform pipeline
(conf/datamodule/transforms/rand_shift.yaml + hulc/utils/transforms.py:8-30)
with batched on-device ops that XLA fuses into the encoder's first conv:

  * ``random_shift``: DrQ-v2 random-shift augmentation. The reference
    implements it as replicate-pad + bilinear grid_sample with *integer*
    pixel shifts — which is mathematically an integer crop of the padded
    image. We therefore implement it as a vmapped dynamic_slice: exact same
    output, no gather/grid_sample, VPU-only.
  * ``preprocess_rgb``: fused u8 -> [-1, 1] float (scale + normalize
    mean 0.5 / std 0.5), optional random shift, on the whole (B, S) batch.
  * ``resize_bilinear``: jax.image.resize wrapper for non-native input sizes
    (CLIP 224px variant, tactile 70px) matching torchvision semantics closely
    enough for training (antialias off, align_corners=False-style).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def random_shift(rng: Array, imgs: Array, pad: int, method: str = "auto") -> Array:
    """DrQ-v2 random shift: replicate-pad by `pad`, crop at a random integer
    offset in [0, 2*pad] per image (same shift for H and W drawn separately).

    Args:
      rng: PRNG key.
      imgs: (B, H, W, C) float or uint8, H == W.
      pad: shift padding (10 for 200px static cam, 4 for 84px gripper cam).
      method: "matmul" (default on TPU) routes the per-image crop through two
        one-hot selection matmuls on the MXU — ~18x faster than the batched
        gather a vmapped dynamic_slice lowers to on TPU, and EXACT for uint8
        (one term per output; bf16 represents 0..255 exactly; MXU accumulates
        fp32). "slice" keeps the dynamic_slice formulation (fast on CPU).

    Returns:
      (B, H, W, C) shifted images, same dtype as input.
    """
    b, h, w, c = imgs.shape
    # Reference draws one shift per image for (x, y) jointly: shape (n, 1, 1, 2).
    shifts = jax.random.randint(rng, (b, 2), 0, 2 * pad + 1)
    if method == "auto":
        method = "matmul" if jax.default_backend() == "tpu" else "slice"

    if method == "slice":
        padded = jnp.pad(imgs, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")

        def crop(img, s):
            return jax.lax.dynamic_slice(img, (s[0], s[1], 0), (h, w, c))

        return jax.vmap(crop)(padded, shifts)

    # Replicate padding is folded into the selection: clamped source indices
    # re-sample the edge row/col, so no padded copy is ever materialized and
    # the contraction dim shrinks from H+2*pad to H (bit-identical output).
    acc = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    x, _ = _shift_matmul(imgs.astype(acc), shifts, pad)
    return x.astype(imgs.dtype)


def _shift_matmul(x: Array, shifts: Array, pad: int):
    """Crop-at-offset as two batched one-hot contractions on the MXU.

    Returns ``(y, layout)`` with y in NHWC order. (An (N,H,C,W)-emitting
    dot_general variant — matching the conv's internal layout to skip a
    relayout copy — was tried in round 2 and made XLA materialize MORE:
    10.1 GB vs 5.8 GB encoder-forward traffic. Keep the einsum form.)
    """
    b, h, w, c = x.shape
    acc = x.dtype
    idx_r = jnp.clip(shifts[:, 0, None] + jnp.arange(h) - pad, 0, h - 1)
    idx_c = jnp.clip(shifts[:, 1, None] + jnp.arange(w) - pad, 0, w - 1)
    rows = jax.nn.one_hot(idx_r, h, dtype=acc)  # (B, H_out, H_src)
    cols = jax.nn.one_hot(idx_c, w, dtype=acc)  # (B, W_out, W_src)
    y = jnp.einsum("nrp,npwc->nrwc", rows, x)
    y = jnp.einsum("nwq,nrqc->nrwc", cols, y)
    return y, "NHWC"


def preprocess_rgb(
    imgs: Array,
    rng: Array | None = None,
    shift_pad: int = 0,
    mean: float = 0.5,
    std: float = 0.5,
    out_dtype: jnp.dtype = jnp.float32,
) -> Array:
    """Fused RGB preprocessing for a (B, S, H, W, C) uint8 batch.

    Order mirrors the reference train pipeline (rand_shift.yaml): random
    shift on raw pixels (a crop commutes with the pointwise scaling), then
    scale to [0, 1], then normalize to [-1, 1]. When shifting on TPU the
    whole path stays in the matmul accumulator dtype — no uint8 round trip.

    Args:
      imgs: (B, S, H, W, C) uint8 (or float already in [0, 255]).
      rng: PRNG key; if None (eval), no augmentation.
      shift_pad: random-shift padding; 0 disables the shift.
      out_dtype: output dtype (pass the model compute dtype, e.g. bf16).

    Returns:
      (B, S, H, W, C) normalized images in out_dtype.
    """
    b, s, h, w, c = imgs.shape
    x = imgs.reshape(b * s, h, w, c)
    # The affine normalization ((v/255 - mean)/std) commutes with the crop
    # (both are linear), so it folds into the shift's output epilogue:
    # one fused multiply-add instead of a separate f32 chain. Keeping the
    # whole path in the compute dtype matters on TPU: the f32 intermediates
    # materialized ~6 full-batch (0.5 GB) HBM tensors per modality and made
    # the train step bandwidth-bound (diagnosed round 2; u8 values are exact
    # in bf16 and the model consumes bf16 anyway).
    scale = 1.0 / (255.0 * std)
    shift = -mean / std
    if rng is not None and shift_pad > 0:
        if jax.default_backend() == "tpu":
            # the selection matmuls always run bf16 on TPU (bit-exact for
            # uint8 inputs, 2x the f32 MXU rate); only the normalize
            # epilogue follows the requested output precision
            shifts = jax.random.randint(rng, (b * s, 2), 0, 2 * shift_pad + 1)
            y, _ = _shift_matmul(x.astype(jnp.bfloat16), shifts, shift_pad)
            epi = jnp.bfloat16 if out_dtype == jnp.bfloat16 else jnp.float32
            return (y.astype(epi) * epi(scale) + epi(shift)).astype(out_dtype)
        x = random_shift(rng, x, shift_pad, method="slice")
    if out_dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
        # eval path, bf16 model: normalize directly in bf16 (no f32 hop)
        return x.astype(jnp.bfloat16) * jnp.bfloat16(scale) + jnp.bfloat16(shift)
    x = x.astype(jnp.float32) * (1.0 / 255.0)
    return ((x - mean) / std).astype(out_dtype)


def preprocess_rgb_seq(
    imgs: Array,
    rng: Array | None = None,
    shift_pad: int = 0,
    mean: float = 0.5,
    std: float = 0.5,
    out_dtype: jnp.dtype = jnp.float32,
) -> Array:
    """Like preprocess_rgb but returns (B, S, H, W, C).

    Note: the reference applies ONE shift per sampled window element
    independently (transforms run per frame on stacked (S, C, H, W)
    tensors with a per-frame random shift); we keep per-frame shifts by
    flattening (B, S) into the batch dim.
    """
    b, s = imgs.shape[:2]
    x = preprocess_rgb(imgs, rng, shift_pad, mean, std, out_dtype)
    return x.reshape((b, s) + x.shape[1:])


def resize_bilinear(imgs: Array, height: int, width: int) -> Array:
    """Bilinear resize for (..., H, W, C) images (torchvision-like)."""
    out_shape = imgs.shape[:-3] + (height, width, imgs.shape[-1])
    return jax.image.resize(imgs.astype(jnp.float32), out_shape, method="bilinear")
