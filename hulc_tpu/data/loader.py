"""Batch assembly + double-buffered host->device pipeline.

The CalvinDataModule equivalent (SURVEY.md §2.9): one loader per modality
("vis" from play windows, "lang" from annotated windows), combined into the
``{"vis": ..., "lang": ...}`` training batch the reference's CombinedLoader
produces (hulc.py:433).

TPU-first: batches leave the host as *uint8* images (4x less PCIe/ICI
traffic than float32); scaling/normalization/augmentation run on device
inside the jitted train step (ops.image_ops). A background thread assembles
the next batch while the device computes (double buffering).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from hulc_tpu.config import HulcConfig
from hulc_tpu.data.dataset import (
    EpisodeStore,
    LangWindowSampler,
    VisionWindowSampler,
)
from hulc_tpu.models.hulc import ModalityBatch


def _keep_indices_slice(robot_obs: np.ndarray, keep_indices) -> np.ndarray:
    parts = [robot_obs[..., a:b] for a, b in keep_indices]
    return np.concatenate(parts, axis=-1)


class ModalityLoader:
    """Assembles ModalityBatch structs for one modality ("vis" or "lang")."""

    def __init__(
        self,
        store: EpisodeStore,
        sampler,
        cfg: HulcConfig,
        batch_size: int = 32,
        relative_actions: bool = True,
        modality: str = "vis",
        seed: int = 0,
    ):
        self.store = store
        self.sampler = sampler
        self.cfg = cfg
        self.batch_size = batch_size
        self.relative_actions = relative_actions
        self.modality = modality
        self.max_window = sampler.max_window
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return max(1, len(self.sampler) // self.batch_size)

    def _assemble(self, samples) -> ModalityBatch:
        cfg = self.cfg
        starts = [s.start for s in samples]
        lengths = [s.length for s in samples]

        def stack(key):
            out = self.store.gather_padded(key, starts, lengths, self.max_window)
            if key == "rel_actions":
                # pad semantics for relative actions: zero motion, keep the
                # repeated gripper command (pad_window equivalence)
                for i, ln in enumerate(lengths):
                    if ln < self.max_window:
                        out[i, ln:, :6] = 0.0
            return out

        action_key = "rel_actions" if self.relative_actions else "actions"
        raw_robot = stack("robot_obs")  # (B, S, 15) unnormalized
        stats = self.store.statistics
        norm_robot = (raw_robot - stats.robot_obs_mean) / np.maximum(stats.robot_obs_std, 1e-6)
        proprio_cfg = cfg.perceptual_encoder.proprio
        if proprio_cfg is not None:
            robot_obs = _keep_indices_slice(
                norm_robot if proprio_cfg.normalize else raw_robot, proprio_cfg.keep_indices
            ).astype(np.float32)
        else:
            # reference default (robot_no_joints): 8 dims fed even when the
            # proprio encoder is disabled (batch schema keeps the key)
            robot_obs = _keep_indices_slice(norm_robot, ((0, 7), (14, 15))).astype(np.float32)

        lang = None
        aux_mask = None
        idx = np.asarray([s.start for s in samples], np.int64)
        if self.modality == "lang":
            lang = np.stack([self.sampler.embeddings[s.lang_idx] for s in samples])
            aux_mask = np.asarray([s.use_for_aux_lang_loss for s in samples])
            idx = np.asarray([s.lang_idx for s in samples], np.int64)

        return ModalityBatch(
            rgb_static=stack("rgb_static"),  # (B, S, H, W, 3) uint8
            rgb_gripper=stack("rgb_gripper") if "rgb_gripper" in self.store.keys else None,
            robot_obs=robot_obs,
            actions=stack(action_key).astype(np.float32),
            state_info_robot_obs=raw_robot.astype(np.float32),
            lang=lang,
            use_for_aux_lang_loss=aux_mask,
            idx=idx,
            depth_static=stack("depth_static") if "depth_static" in self.store.keys else None,
            depth_gripper=stack("depth_gripper") if "depth_gripper" in self.store.keys else None,
        )

    def next_batch(self) -> ModalityBatch:
        return self._assemble([self.sampler.sample() for _ in range(self.batch_size)])

    def deterministic_batch(self, step: int) -> ModalityBatch:
        """Sequential (wrap-around) batch for validation."""
        n = len(self.sampler)
        idxs = [(step * self.batch_size + i) % n for i in range(self.batch_size)]
        return self._assemble([self.sampler.sample_at(i, deterministic=True) for i in idxs])


class CombinedLoader:
    """Yields {"vis": ModalityBatch, "lang": ModalityBatch} with prefetch.

    Epoch length = max over modality loaders (reference num_training_steps,
    hulc.py:198-200). deterministic=True iterates samples sequentially
    (validation; reference shuffle_val=False).
    """

    def __init__(
        self, loaders: Dict[str, ModalityLoader], prefetch: int = 2, deterministic: bool = False
    ):
        self.loaders = loaders
        self.prefetch = prefetch
        self.deterministic = deterministic
        self._step = 0

    def __len__(self) -> int:
        return max(len(l) for l in self.loaders.values())

    def _make(self) -> Dict[str, ModalityBatch]:
        if self.deterministic:
            out = {k: l.deterministic_batch(self._step) for k, l in self.loaders.items()}
            self._step += 1
            return out
        return {k: l.next_batch() for k, l in self.loaders.items()}

    def __iter__(self) -> Iterator[Dict[str, ModalityBatch]]:
        if self.deterministic:
            self._step = 0  # every epoch evaluates the same slice
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        steps = len(self)

        def put_bounded(item) -> bool:
            # bounded put so an early-terminated consumer (validate()
            # breaking at max_batches) doesn't leave us blocked forever
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for _ in range(steps):
                    if stop.is_set():
                        return
                    if not put_bounded(self._make()):
                        return
            except BaseException as exc:  # surface I/O errors to the consumer
                put_bounded(exc)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            for _ in range(steps):
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            t.join(timeout=5.0)


def make_loaders(
    cfg: HulcConfig,
    root_data_dir,
    split: str = "training",
    batch_size: int = 32,
    min_window: int = 20,
    max_window: int = 32,
    relative_actions: bool = True,
    lang_folder: str = "lang_paraphrase-MiniLM-L3-v2",
    aux_lang_loss_window: int = 8,
    cache: str = "ram",
    seed: int = 0,
    with_depth: bool = False,
    deterministic: bool = False,
    modalities: Tuple[str, ...] = ("vis", "lang"),
) -> CombinedLoader:
    """Build the (possibly single-) modality loader for one split.

    modalities: ("vis", "lang") default; ("vis",) / ("lang",) mirror the
    reference's vision_only / lang_only dataset configs.
    """
    import pathlib

    split_dir = pathlib.Path(root_data_dir) / split
    keys = ["rgb_static", "actions", "rel_actions", "robot_obs", "scene_obs"]
    if cfg.perceptual_encoder.rgb_gripper is not None:
        keys.insert(1, "rgb_gripper")
    if with_depth or cfg.perceptual_encoder.depth_static is not None:
        keys.append("depth_static")
    if with_depth or cfg.perceptual_encoder.depth_gripper is not None:
        keys.append("depth_gripper")
    store = EpisodeStore(split_dir, keys=keys, cache=cache)

    loaders = {}
    if "vis" in modalities:
        vis_sampler = VisionWindowSampler(store.episode_ranges, min_window, max_window, seed=seed)
        loaders["vis"] = ModalityLoader(
            store, vis_sampler, cfg, batch_size, relative_actions, "vis", seed + 2
        )
    if "lang" in modalities:
        lang_sampler = LangWindowSampler(
            split_dir,
            lang_folder=lang_folder,
            min_window=min_window,
            max_window=max_window,
            aux_lang_loss_window=aux_lang_loss_window,
            seed=seed + 1,
        )
        loaders["lang"] = ModalityLoader(
            store, lang_sampler, cfg, batch_size, relative_actions, "lang", seed + 3
        )
    if not loaders:
        raise ValueError(f"no modalities selected from {modalities!r}")
    return CombinedLoader(loaders, deterministic=deterministic)
