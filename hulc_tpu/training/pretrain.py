"""Warm-start utilities (reference hulc/utils/utils.py:7-16
initialize_pretrained_weights): load params from a previous checkpoint or a
converted torch checkpoint, resizing the plan-recognition position-embedding
table when window sizes differ and optionally excluding the plan-recognition
subtree ("in_exclude_pr" behavior).
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import numpy as np


def _resize_position_embeddings(params: Dict[str, Any], target_rows: int) -> None:
    pr = params.get("plan_recognition")
    if not pr or "position_embeddings" not in pr:
        return
    pe = np.asarray(pr["position_embeddings"])
    if pe.shape[0] == target_rows:
        return
    if pe.shape[0] > target_rows:
        pr["position_embeddings"] = pe[:target_rows]  # trim (reference behavior)
    else:
        extra = np.random.default_rng(0).normal(0, 0.02, (target_rows - pe.shape[0], pe.shape[1]))
        pr["position_embeddings"] = np.concatenate([pe, extra.astype(pe.dtype)], axis=0)


def initialize_pretrained_weights(
    target_params: Dict[str, Any],
    source_params: Dict[str, Any],
    exclude_plan_recognition: bool = False,
) -> Dict[str, Any]:
    """Graft source params onto a freshly-initialized target tree.

    Subtrees present in both are taken from source; missing subtrees keep
    their fresh init. Position-embedding tables are resized to the target's.
    """
    import jax

    out = dict(target_params)
    for key, sub in source_params.items():
        if exclude_plan_recognition and key == "plan_recognition":
            continue
        if key not in out:
            continue
        out[key] = jax.tree.map(lambda x: x, sub)
    if "plan_recognition" in out and "position_embeddings" in out.get("plan_recognition", {}):
        target_rows = np.asarray(target_params["plan_recognition"]["position_embeddings"]).shape[0]
        out["plan_recognition"] = dict(out["plan_recognition"])
        _resize_position_embeddings(out, target_rows)
    return out


def load_pretrained(
    path, cfg, target_params, exclude_plan_recognition: bool = False
) -> Dict[str, Any]:
    """Load a warm-start source: orbax run dir / epoch dir, or torch .ckpt."""
    path = pathlib.Path(path)
    if path.suffix in (".ckpt", ".pt", ".pth"):
        from hulc_tpu.training.torch_convert import load_torch_checkpoint

        source, _ = load_torch_checkpoint(path, cfg)
    else:
        from hulc_tpu.training import checkpoint as ckpt

        if (path / "saved_models").exists():
            ckpt_path = ckpt.latest_checkpoint(path)  # run dir -> latest epoch
        else:
            ckpt_path = path  # already an epoch checkpoint dir
        source = ckpt.restore_params(ckpt_path, target_params)
    return initialize_pretrained_weights(target_params, source, exclude_plan_recognition)
