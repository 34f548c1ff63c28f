"""Validation-only diagnostics (reference Hulc.clip_groundtruth,
hulc.py:980-1044): rank ground-truth task ids by CLIP similarity between the
plan-recognition visual features of language-batch windows and a bank of
encoded language instructions. Logged as lang_gt/{score,sr}.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def clip_groundtruth_metrics(
    model,
    params,
    seq_feat: jax.Array,
    gt_task_ids: np.ndarray,
    bank_lang_emb: np.ndarray,
    bank_task_ids: np.ndarray,
    mask: np.ndarray | None = None,
) -> Dict[str, float]:
    """Ranking score + SR of matching visual features to instruction bank.

    Args:
      seq_feat: (B, F) plan-recognition features of language windows.
      gt_task_ids: (B,) int ids of the ground-truth tasks.
      bank_lang_emb: (N, 384) raw language embeddings of the instruction bank.
      bank_task_ids: (N,) int task ids of the bank entries.
      mask: (B,) bool use_for_aux_lang_loss mask.
    """
    if mask is None:
        mask = np.ones(len(gt_task_ids), bool)
    mask = np.asarray(mask, bool)
    if not mask.any():
        return {}
    encoded_bank = model.apply(
        {"params": params}, jnp.asarray(bank_lang_emb), method=model.encode_language_goal
    )
    img_f, lang_f = model.apply(
        {"params": params},
        seq_feat,
        encoded_bank,
        method=lambda m, v, l: m.proj_vis_lang(v, l),
    )
    img_f = np.asarray(img_f, np.float64)
    lang_f = np.asarray(lang_f, np.float64)
    img_f /= np.linalg.norm(img_f, axis=-1, keepdims=True)
    lang_f /= np.linalg.norm(lang_f, axis=-1, keepdims=True)
    logit_scale = float(np.exp(np.asarray(params["logit_scale"])))
    scores = logit_scale * img_f @ lang_f.T  # (B, N)

    # min-max normalize each row (reference hulc.py:1030-1032)
    mins = scores.min(axis=1, keepdims=True)
    maxs = scores.max(axis=1, keepdims=True)
    norm = (scores - mins) / np.maximum(maxs - mins, 1e-9)

    gt = np.asarray(gt_task_ids)
    bank = np.asarray(bank_task_ids)
    sel = mask
    score_terms = []
    for i in np.where(sel)[0]:
        pos = norm[i, bank == gt[i]].sum()
        neg = norm[i, bank != gt[i]].sum()
        score_terms.append(pos - neg)
    pred = bank[np.argmax(scores, axis=1)]
    sr = float(np.mean(pred[sel] == gt[sel]))
    return {"lang_gt_score": float(np.mean(score_terms)), "lang_gt_sr": sr}
