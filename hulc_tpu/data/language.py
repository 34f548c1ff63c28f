"""Language embedding backends + offline annotation tooling.

Reference surface: hulc/models/encoders/language_network.py (SBert MiniLM
used to precompute the 384-d annotation embeddings, conf/lang_ann.yaml),
clip_lang_encoder.py (CLIP text encoder variant), and the external
calvin_agent lang-annotation pipeline that writes ``auto_lang_ann.npy``.

Backends:
  * PrecomputedEmbedder — lookup into an existing auto_lang_ann / embeddings
    file (the default training path; no model needed).
  * MiniLMEmbedder — sentence-transformers-compatible mean-pooled MiniLM via
    the ``transformers`` library; requires locally available weights (this
    environment has no network egress).
  * ClipTextEmbedder — our flax CLIP text tower + BPE tokenizer.
  * HashEmbedder — deterministic pseudo-embeddings for tests/CI.

``write_lang_annotations`` regenerates auto_lang_ann.npy / embeddings.npy in
the exact CALVIN schema from (annotation, task, frame-range) triples.
"""

from __future__ import annotations

import hashlib
import pathlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def load_task_embeddings(path) -> Dict[str, np.ndarray]:
    """validation embeddings.npy -> {task: (384,) embedding} (shared by the
    eval CLI, the rollout callback, and the trainer)."""
    raw = np.load(path, allow_pickle=True).item()
    return {k: np.asarray(v["emb"], np.float32).reshape(-1) for k, v in raw.items()}


def restrict_task_pool(lang_embeddings: Optional[Dict[str, np.ndarray]], all_tasks, min_pool: int = 5):
    """Tasks evaluable with the available embeddings (chains need >= min_pool)."""
    if not lang_embeddings:
        return list(all_tasks)
    pool = sorted(set(all_tasks) & set(lang_embeddings))
    if len(pool) < min_pool:
        pool = sorted(lang_embeddings)
    return pool


class PrecomputedEmbedder:
    """Sentence -> embedding lookup from auto_lang_ann.npy or embeddings.npy."""

    def __init__(self, path):
        data = np.load(path, allow_pickle=True).item()
        if "language" in data:  # auto_lang_ann.npy
            anns = data["language"]["ann"]
            embs = np.asarray(data["language"]["emb"], np.float32)
            self.table = {a: e.reshape(-1) for a, e in zip(anns, embs)}
        else:  # validation embeddings.npy {task: {ann, emb}}
            self.table = {
                v["ann"][0]: np.asarray(v["emb"], np.float32).reshape(-1) for v in data.values()
            }

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        return np.stack([self.table[t] for t in texts])


class HashEmbedder:
    """Deterministic pseudo-embeddings (tests / smoke training)."""

    def __init__(self, dim: int = 384):
        self.dim = dim

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            seed = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
            out[i] = np.random.default_rng(seed).normal(size=self.dim)
        return out


class MiniLMEmbedder:
    """sentence-transformers-style MiniLM (mean pooling over token states).

    model_path must point at locally available weights (e.g. a downloaded
    ``paraphrase-MiniLM-L3-v2``); the transformers library is bundled here
    but there is no network egress for auto-download.
    """

    def __init__(self, model_path: str):
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = AutoModel.from_pretrained(model_path)
        self.model.eval()

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        import torch

        enc = self.tokenizer(list(texts), padding=True, truncation=True, return_tensors="pt")
        with torch.no_grad():
            out = self.model(**enc).last_hidden_state  # (N, T, D)
        mask = enc["attention_mask"].unsqueeze(-1).float()
        pooled = (out * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        return pooled.numpy().astype(np.float32)


class ClipTextEmbedder:
    """CLIP text-tower embeddings via our flax implementation."""

    def __init__(self, text_params, model_name: str = "RN50", bpe_path: Optional[str] = None):
        import jax.numpy as jnp

        from hulc_tpu.models.clip import CLIP_CONFIGS, CLIPTextTransformer
        from hulc_tpu.utils.clip_tokenizer import SimpleTokenizer, tokenize

        self._tokenize = tokenize
        self._tokenizer = SimpleTokenizer(bpe_path)
        self._model = CLIPTextTransformer(output_dim=CLIP_CONFIGS[model_name]["embed_dim"])
        self._params = text_params
        self._jnp = jnp

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        tokens = self._tokenize(list(texts), tokenizer=self._tokenizer)
        out = self._model.apply({"params": self._params}, self._jnp.asarray(tokens))
        return np.asarray(out, np.float32)


def write_lang_annotations(
    out_dir,
    annotations: Sequence[Tuple[str, str, Tuple[int, int]]],
    embedder,
    validation_embeddings: bool = False,
) -> None:
    """Write auto_lang_ann.npy (+ optional embeddings.npy) in CALVIN schema.

    annotations: (annotation_sentence, task_id, (start_frame, end_frame)).
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    anns = [a for a, _, _ in annotations]
    tasks = [t for _, t, _ in annotations]
    indx = [tuple(r) for _, _, r in annotations]
    embs = embedder.embed(anns)[:, None, :]  # (N, 1, D) like the reference
    data = {
        "language": {"ann": anns, "task": tasks, "emb": embs.astype(np.float32)},
        "info": {"indx": indx},
    }
    np.save(out_dir / "auto_lang_ann.npy", data, allow_pickle=True)

    if validation_embeddings:
        by_task: Dict[str, Dict] = {}
        for ann, task in zip(anns, tasks):
            if task not in by_task:
                emb = embedder.embed([ann])
                by_task[task] = {"ann": [ann], "emb": emb.astype(np.float32)}
        np.save(out_dir / "embeddings.npy", by_task, allow_pickle=True)
