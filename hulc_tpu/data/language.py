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


# ---------------------------------------------------------------------------
# Automatic task annotation of play data (the calvin_agent lang_ann pipeline:
# conf/lang_ann.yaml keys prior_steps_window / reannotate)
# ---------------------------------------------------------------------------

def load_annotation_pools(split: str = "training") -> Optional[Dict[str, List[str]]]:
    """CALVIN's published paraphrase pools (vendored MIT-licensed data asset,
    assets/annotations/new_playtable*.yaml — 389 train / 34 val phrases over
    the 34 tasks). Returns None if the asset or pyyaml is unavailable, in
    which case the fallback TASK_INSTRUCTIONS bank below is used."""
    import pathlib

    name = (
        "new_playtable.yaml" if split == "training" else "new_playtable_validation.yaml"
    )
    path = pathlib.Path(__file__).parent.parent / "assets" / "annotations" / name
    if not path.exists():
        return None
    try:
        import yaml

        pools = yaml.safe_load(path.read_text())
        if not isinstance(pools, dict) or not pools:
            return None  # truncated/empty asset: fall back, don't crash
        return {k: list(v) for k, v in pools.items()}
    except Exception:  # noqa: BLE001
        return None


# Fallback instruction templates per task (fresh phrasings in the spirit of
# CALVIN's synonymous-instruction bank) — used when the vendored paraphrase
# asset is unavailable; training samples uniformly either way.
TASK_INSTRUCTIONS: Dict[str, List[str]] = {
    **{
        f"rotate_{c}_block_{d}": [
            f"rotate the {c} block towards the {d}",
            f"turn the {c} block {d}",
        ]
        for c in ("red", "blue", "pink")
        for d in ("right", "left")
    },
    **{
        f"push_{c}_block_{d}": [
            f"push the {c} block to the {d}",
            f"slide the {c} block {d}wards",
        ]
        for c in ("red", "blue", "pink")
        for d in ("right", "left")
    },
    "move_slider_left": ["move the sliding door to the left", "push the slider left"],
    "move_slider_right": ["move the sliding door to the right", "push the slider right"],
    "open_drawer": ["pull the drawer open", "open the drawer"],
    "close_drawer": ["push the drawer closed", "close the drawer"],
    **{
        f"lift_{c}_block_{s}": [
            f"pick up the {c} block from the {s}",
            f"lift the {c} block off the {s}",
        ]
        for c in ("red", "blue", "pink")
        for s in ("table", "slider", "drawer")
    },
    "place_in_slider": ["put the held block into the slider", "place the block in the sliding cabinet"],
    "place_in_drawer": ["put the held block into the drawer", "place the block in the drawer"],
    "stack_block": ["stack one block on top of another", "put a block onto another block"],
    "unstack_block": ["take the top block off the stack", "unstack the blocks"],
    "turn_on_lightbulb": ["switch on the light bulb", "turn the light bulb on"],
    "turn_off_lightbulb": ["switch off the light bulb", "turn the light bulb off"],
    "turn_on_led": ["switch on the led", "turn the led light on"],
    "turn_off_led": ["switch off the led", "turn the led light off"],
    "push_into_drawer": ["push a block into the open drawer", "sweep the block into the drawer"],
}


def annotate_play_data(
    store,
    oracle=None,
    window: int = 64,
    prior_steps_window: int = 64,
    stride: int = 16,
    seed: int = 0,
    pool_split: str = "training",
    info_fn=None,
    pools: Optional[Dict[str, List[str]]] = None,
) -> List[Tuple[str, str, Tuple[int, int]]]:
    """Detect task completions in teleoperated play data with the task
    oracle and emit (instruction, task, (start, end)) annotation triples.

    Mirrors the calvin_agent annotation pipeline semantics: a sliding
    ``window`` over each episode; when the oracle detects exactly one task
    between the window's endpoints, the completion frame is located by
    bisection and the annotated range covers the ``prior_steps_window``
    frames leading up to it (conf/lang_ann.yaml prior_steps_window).
    Overlapping detections of the same task event are deduplicated.

    store: EpisodeStore loaded with at least the "scene_obs" key.
    info_fn: optional ``t -> info dict`` override — e.g. to synthesize
    ``block_contacts`` from recorded state (fake_env.contacts_from_state),
    which makes the contact-gated task families (place_*) detectable.
    """
    from hulc_tpu.evaluation.tasks import SceneObsTasks

    oracle = oracle or SceneObsTasks()
    rng = np.random.default_rng(seed)
    # validation splits use CALVIN's 1-phrase-per-task validation pool so
    # generated annotations match the published instruction distribution;
    # an explicit ``pools`` overrides (e.g. phrase-capped pools for
    # hash-embedding runs, scripts/playtable_policy.py)
    if pools is None:
        pools = load_annotation_pools(pool_split) or TASK_INSTRUCTIONS

    def info_at(t: int) -> Dict:
        if info_fn is not None:
            return info_fn(t)
        return {"scene_obs": store.get_window(t, 1)["scene_obs"][0]}

    annotations: List[Tuple[str, str, Tuple[int, int]]] = []
    for a, b in store.episode_ranges:
        # dedup window is per-episode: frame indices are contiguous across
        # episodes, so a stale last_end from the previous episode would
        # suppress an independent completion of the same task early here
        last_end: Dict[str, int] = {}
        t = a
        while t + window <= b:
            done = oracle.get_task_info(info_at(t), info_at(t + window))
            if len(done) == 1:
                task = next(iter(done))
                # bisect the earliest offset at which the task reads complete
                lo, hi = 1, window
                while lo < hi:
                    mid = (lo + hi) // 2
                    if task in oracle.get_task_info_for_set(
                        info_at(t), info_at(t + mid), {task}
                    ):
                        hi = mid
                    else:
                        lo = mid + 1
                end = t + lo
                if end - last_end.get(task, -(10**9)) > prior_steps_window // 2:
                    start = max(a, end - prior_steps_window)
                    templates = pools.get(task, [task.replace("_", " ")])
                    ann = templates[int(rng.integers(len(templates)))]
                    annotations.append((ann, task, (start, end)))
                    last_end[task] = end
            t += stride
    return annotations


def main(argv=None):
    """CLI: detect/refresh language annotations for a CALVIN split.

    Default: run the oracle detection and write auto_lang_ann.npy.
    --reannotate: keep the existing annotation ranges and only re-embed the
    sentences with the chosen backend (conf/lang_ann.yaml reannotate=false
    semantics).
    """
    import argparse

    p = argparse.ArgumentParser(description="language annotation pipeline")
    p.add_argument("--data", required=True, help="split dir (training/ or validation/)")
    p.add_argument("--lang-folder", default="lang_paraphrase-MiniLM-L3-v2")
    p.add_argument("--embedder", default="hash", choices=["hash", "minilm", "precomputed"])
    p.add_argument("--model-path", default=None,
                   help="local MiniLM weights dir (required for --embedder minilm)")
    p.add_argument("--window", type=int, default=64)
    p.add_argument("--prior-steps-window", type=int, default=64)
    p.add_argument("--stride", type=int, default=16)
    p.add_argument("--validation-embeddings", action="store_true")
    p.add_argument("--reannotate", action="store_true", help="re-embed existing annotations only")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from hulc_tpu.data.dataset import EpisodeStore

    split = pathlib.Path(args.data)
    out_dir = split / args.lang_folder
    if args.embedder == "minilm":
        if not args.model_path:
            raise SystemExit("--embedder minilm requires --model-path (no network egress)")
        embedder = MiniLMEmbedder(args.model_path)
    elif args.embedder == "precomputed":
        embedder = PrecomputedEmbedder(out_dir / "auto_lang_ann.npy")
    else:
        embedder = HashEmbedder()

    if args.reannotate:
        data = np.load(out_dir / "auto_lang_ann.npy", allow_pickle=True).item()
        annotations = list(
            zip(data["language"]["ann"], data["language"]["task"],
                [tuple(r) for r in data["info"]["indx"]])
        )
    else:
        store = EpisodeStore(split, keys=["scene_obs"], cache="ram")
        pool_split = (
            "validation"
            if args.validation_embeddings or split.name.startswith("validation")
            else "training"
        )
        annotations = annotate_play_data(
            store, window=args.window, prior_steps_window=args.prior_steps_window,
            stride=args.stride, seed=args.seed, pool_split=pool_split,
        )
    write_lang_annotations(
        out_dir, annotations, embedder, validation_embeddings=args.validation_embeddings
    )
    tasks = sorted({t for _, t, _ in annotations})
    print(f"[lang_ann] wrote {len(annotations)} annotations ({len(tasks)} tasks) to {out_dir}")


if __name__ == "__main__":
    main()
