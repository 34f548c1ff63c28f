"""Validation-only diagnostics (reference Hulc.clip_groundtruth,
hulc.py:980-1044): rank ground-truth task ids by CLIP similarity between the
plan-recognition visual features of language-batch windows and a bank of
encoded language instructions. :class:`ClipGroundtruthCallback` logs them as
lang_gt/{score,sr} after each validation epoch (wired by the training CLI
when the CLIP auxiliary loss is enabled).
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


class ClipGroundtruthCallback:
    """Per-epoch lang_gt diagnostics from the validation language sampler.

    Builds the instruction bank (one embedding per annotation, task-labeled)
    from the LangWindowSampler and ranks each val window's seq_feat against
    it.
    """

    def __init__(self, val_loader, max_batches: int = 4):
        self.val_loader = val_loader
        self.max_batches = max_batches
        sampler = val_loader.loaders["lang"].sampler
        tasks = sorted(set(sampler.tasks))
        self._task_to_id = {t: i for i, t in enumerate(tasks)}
        self.bank_emb = np.asarray(sampler.embeddings, np.float32)
        self.bank_ids = np.asarray([self._task_to_id[t] for t in sampler.tasks])
        self._sampler = sampler

    def on_epoch_end(self, trainer, state, epoch: int):
        import jax

        from hulc_tpu.training.preprocess import preprocess_batch

        model = trainer.model
        metrics_acc = []
        lang_loader = self.val_loader.loaders["lang"]
        for i in range(self.max_batches):
            # lang-only deterministic batches: skips assembling (and throwing
            # away) the vision-modality image gathers
            lang_batch = lang_loader.deterministic_batch(i)
            prep = preprocess_batch(trainer.cfg, {"lang": lang_batch}, rng=None, train=False)
            emb, _ = model.apply({"params": state.params}, prep["lang"], method=model.encode)
            _, seq_feat = model.apply(
                {"params": state.params}, emb, method=lambda m, e: m.plan_recognition(e)
            )
            gt = np.asarray(
                [self._task_to_id[self._sampler.tasks[int(j)]] for j in lang_batch.idx]
            )
            m = clip_groundtruth_metrics(
                model, state.params, seq_feat, gt, self.bank_emb, self.bank_ids,
                mask=np.asarray(lang_batch.use_for_aux_lang_loss),
            )
            if m:
                metrics_acc.append(m)
        if not metrics_acc:
            return None
        mean = {k: float(np.mean([m[k] for m in metrics_acc])) for k in metrics_acc[0]}
        trainer.logger.log(mean, int(state.step), "lang_gt")
        print(f"[lang_gt] epoch {epoch}: sr={mean['lang_gt_sr']:.3f}")
        return mean
