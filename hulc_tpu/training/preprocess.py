"""On-device batch preprocessing: uint8 images -> normalized float + aug.

The device-side half of the input pipeline (the reference does all of this
in CPU dataloader workers — conf/datamodule/transforms/rand_shift.yaml).
Runs inside the jitted train step so XLA fuses the scale/normalize into the
first conv; the random shift is a vmapped dynamic_slice (ops.image_ops).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hulc_tpu.config import HulcConfig, VisionEncoderConfig
from hulc_tpu.models.hulc import ModalityBatch
from hulc_tpu.ops.image_ops import preprocess_rgb_seq, resize_bilinear

Array = jax.Array


def _prep_one(enc_cfg: VisionEncoderConfig, imgs, rng, train, dtype):
    if imgs.shape[2] != enc_cfg.input_size:
        # e.g. 200px dataset images into a 224px CLIP encoder
        imgs = resize_bilinear(imgs, enc_cfg.input_size, enc_cfg.input_size)
    if enc_cfg.kind == "clip":
        from hulc_tpu.models.clip import clip_preprocess

        b, s = imgs.shape[:2]
        return clip_preprocess(imgs).astype(dtype)
    return preprocess_rgb_seq(
        imgs, rng, enc_cfg.shift_pad if train else 0, out_dtype=dtype
    )


def preprocess_modality(
    cfg: HulcConfig, batch: ModalityBatch, rng: Optional[Array], train: bool
) -> ModalityBatch:
    pe = cfg.perceptual_encoder
    k_static = k_gripper = None
    if train and rng is not None:
        k_static, k_gripper = jax.random.split(rng)
    dtype = cfg.dtype
    updates = {
        "rgb_static": _prep_one(pe.rgb_static, batch.rgb_static, k_static, train, dtype)
    }
    if batch.rgb_gripper is not None and pe.rgb_gripper is not None:
        updates["rgb_gripper"] = _prep_one(
            pe.rgb_gripper, batch.rgb_gripper, k_gripper, train, dtype
        )
    return batch._replace(**updates)


def preprocess_batch(
    cfg: HulcConfig,
    batch: Dict[str, ModalityBatch],
    rng: Optional[Array] = None,
    train: bool = True,
) -> Dict[str, ModalityBatch]:
    out = {}
    for scope, mod in batch.items():
        if rng is not None:
            rng, k = jax.random.split(rng)
        else:
            k = None
        out[scope] = preprocess_modality(cfg, mod, k, train)
    return out
