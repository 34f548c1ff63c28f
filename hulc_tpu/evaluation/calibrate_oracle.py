"""Data-driven calibration of the SceneObsTasks containment regions.

The position-derived containment fallbacks of the task oracle
(hulc_tpu/evaluation/tasks.py) classify a block as "in the drawer" / "on
the slider plank" / "on the table" from nominal region boxes. Those boxes
are hand-tuned; on the real calvin_env geometry they are unvalidated
(VERDICT round 1). The real calvin_env derives containment from PyBullet
contacts, which we cannot run here — but the CALVIN dataset itself records
ground truth: every language annotation of a ``lift_<color>_block_<where>``
episode asserts that the block started ON that surface, with its position
in ``scene_obs``. This module fits the region boxes from those labeled
traces:

  * ``lift_*_drawer``  start positions  -> drawer box
  * ``lift_*_slider``  start positions  -> slider (plank) box
  * ``lift_*_table``   start z          -> table surface height
  * ``place_in_*``     END positions    -> widen the same boxes

Each box is the per-axis [min, max] of the observed positions, expanded by
``margin``. Calibration output is a JSON consumed by
``SceneObsTasks.from_calibration`` (or the ``regions=`` kwarg).

CLI: ``python -m hulc_tpu.evaluation.calibrate_oracle --data <split_dir>``
"""

from __future__ import annotations

import json
import pathlib
from typing import Dict, List, Optional

import numpy as np

from hulc_tpu.evaluation.tasks import _BLOCK_SLICES

_LANG_FOLDER = "lang_paraphrase-MiniLM-L3-v2"


def _block_of(task: str) -> Optional[str]:
    for color in ("red", "blue", "pink"):
        if f"_{color}_block" in task or task.startswith(f"{color}_"):
            return f"block_{color}"
    return None


def collect_region_samples(
    split_dir, lang_folder: str = _LANG_FOLDER
) -> Dict[str, List[np.ndarray]]:
    """Gather labeled block positions per region from annotated episodes."""
    from hulc_tpu.data.dataset import EpisodeStore

    split_dir = pathlib.Path(split_dir)
    ann_path = split_dir / lang_folder / "auto_lang_ann.npy"
    data = np.load(ann_path, allow_pickle=True).item()
    tasks = list(data["language"]["task"])
    ranges = [(int(a), int(b)) for a, b in data["info"]["indx"]]

    store = EpisodeStore(split_dir, keys=["scene_obs"], cache="none")
    samples: Dict[str, List[np.ndarray]] = {"drawer": [], "slider": [], "table": []}
    for task, (start, end) in zip(tasks, ranges):
        block = _block_of(task)
        if task.startswith("lift_") and block is not None:
            surf = task.rsplit("_", 1)[-1]  # table | slider | drawer
            if surf in samples:
                obs = store.get_window(start, 1)["scene_obs"][0]
                samples[surf].append(np.asarray(obs)[_BLOCK_SLICES[block]][:3])
        elif task in ("place_in_drawer", "place_in_slider"):
            surf = task.rsplit("_", 1)[-1]
            obs_end = store.get_window(end, 1)["scene_obs"][0]
            # the placed block is the one nearest the region — without
            # contact truth, take the block that moved INTO a cluster; we
            # conservatively add all blocks' end positions that are near
            # the existing lift cluster later (handled in fit via margin),
            # so here record only when lift data exists for the region.
            for b in _BLOCK_SLICES:
                samples.setdefault(f"place_{surf}", []).append(
                    np.asarray(obs_end)[_BLOCK_SLICES[b]][:3]
                )
    return samples


def fit_regions(
    samples: Dict[str, List[np.ndarray]], margin: float = 0.03
) -> Dict:
    """Per-axis [min, max] (+/- margin) boxes from labeled positions.

    place_* samples include unplaced blocks; they only widen a box when
    they already fall inside the lift-derived box expanded by the margin
    (outliers from the other two blocks are rejected).
    """
    out: Dict = {}

    def box_from(points: np.ndarray):
        lo = points.min(axis=0) - margin
        hi = points.max(axis=0) + margin
        return tuple((float(l), float(h)) for l, h in zip(lo, hi))

    for name, key in (("drawer_box", "drawer"), ("slider_box", "slider")):
        pts = samples.get(key, [])
        if not pts:
            continue
        pts = np.asarray(pts)
        box = box_from(pts)
        extra = [
            p
            for p in samples.get(f"place_{key}", [])
            if all(lo <= c <= hi for c, (lo, hi) in zip(p, box))
        ]
        if extra:
            box = box_from(np.concatenate([pts, np.asarray(extra)], axis=0))
        out[name] = box
        out[f"{name}_n_samples"] = int(len(pts))
    if samples.get("table"):
        zs = np.asarray(samples["table"])[:, 2]
        out["table_z"] = float(np.median(zs))
        out["table_z_tol"] = float(max(0.02, np.abs(zs - np.median(zs)).max() + 0.005))
        out["table_n_samples"] = int(len(zs))
    return out


def calibrate(split_dir, lang_folder: str = _LANG_FOLDER, margin: float = 0.03) -> Dict:
    return fit_regions(collect_region_samples(split_dir, lang_folder), margin)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="calibrate oracle regions from a CALVIN split")
    p.add_argument("--data", required=True, help="split dir (training/ or validation/)")
    p.add_argument("--lang-folder", default=_LANG_FOLDER)
    p.add_argument("--margin", type=float, default=0.03)
    p.add_argument("--out", default=None, help="output JSON (default: <data>/oracle_regions.json)")
    args = p.parse_args(argv)

    regions = calibrate(args.data, args.lang_folder, args.margin)
    out = pathlib.Path(args.out or (pathlib.Path(args.data) / "oracle_regions.json"))
    out.write_text(json.dumps(regions, indent=2))
    print(f"[calibrate] wrote {out}: "
          + ", ".join(f"{k}={v}" for k, v in regions.items() if k.endswith("_samples")))


if __name__ == "__main__":
    main()
