"""Orbax checkpointing with the reference's resume semantics.

Reference: Lightning ModelCheckpoint writing ``saved_models/{epoch}.ckpt``
and resuming from the latest checkpoint in a fixed run dir
(training.py:38-46, SURVEY.md §5). Here: one orbax directory per epoch under
``<run_dir>/saved_models/epoch_<N>`` holding params + opt_state + counters;
``latest_checkpoint``/``all_checkpoints`` mirror
calvin_agent.utils.get_last_checkpoint / get_all_checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import re
import shutil
from typing import Any, Dict, List, Optional, Union

import jax
import orbax.checkpoint as ocp

_EPOCH_RE = re.compile(r"epoch_(\d+)$")


def _ckpt_dir(run_dir) -> pathlib.Path:
    return pathlib.Path(run_dir) / "saved_models"


def save_checkpoint(run_dir, epoch: int, state: Dict[str, Any]) -> pathlib.Path:
    """Save a pytree state dict for an epoch (overwrites if present)."""
    path = _ckpt_dir(run_dir) / f"epoch_{epoch}"
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as saver:
        saver.save(path.absolute(), state, force=True)
    return path


def restore_checkpoint(path, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into ``template``'s structure. Orbax casts each leaf to the
    template's dtype, so a run checkpointed with f32 adam moments resumes
    under ``adam_mv_dtype="bfloat16"`` (and back) — the knob changes
    storage rounding only, so the cast is the faithful continuation
    (pinned by test_resume_across_adam_mv_dtype)."""
    with ocp.StandardCheckpointer() as restorer:
        return restorer.restore(pathlib.Path(path).absolute(), template)


def _path_str(key_path) -> str:
    return jax.tree_util.keystr(key_path)


def restore_params(path, params_template) -> Any:
    """Restore only the params subtree (evaluation does not need opt_state).

    Leaves are matched by NAME (pytree key path), not position: a checkpoint
    from a different config fails loudly with the offending parameter names
    instead of silently transplanting same-arity weights.
    """
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as restorer:
        restored = restorer.restore(pathlib.Path(path).absolute())

    flat_template, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    flat_restored = jax.tree_util.tree_flatten_with_path(restored["params"])[0]
    by_name = {_path_str(kp): leaf for kp, leaf in flat_restored}
    template_names = [_path_str(kp) for kp, _ in flat_template]
    missing = [n for n in template_names if n not in by_name]
    extra = sorted(set(by_name) - set(template_names))
    if missing or extra:
        raise ValueError(
            f"checkpoint params do not match template by name: "
            f"missing={missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"extra={extra[:5]}{'...' if len(extra) > 5 else ''}"
        )
    for (kp, tleaf) in flat_template:
        rleaf = by_name[_path_str(kp)]
        if getattr(tleaf, "shape", None) is not None and tuple(tleaf.shape) != tuple(rleaf.shape):
            raise ValueError(
                f"shape mismatch for {_path_str(kp)}: checkpoint {rleaf.shape} "
                f"vs template {tleaf.shape}"
            )
    return jax.tree_util.tree_unflatten(treedef, [by_name[n] for n in template_names])


def all_checkpoints(run_dir) -> List[pathlib.Path]:
    d = _ckpt_dir(run_dir)
    if not d.exists():
        return []
    found = []
    for p in d.iterdir():
        m = _EPOCH_RE.search(p.name)
        if m and p.is_dir():
            found.append((int(m.group(1)), p))
    return [p for _, p in sorted(found)]


def latest_checkpoint(run_dir) -> Optional[pathlib.Path]:
    ckpts = all_checkpoints(run_dir)
    return ckpts[-1] if ckpts else None


def checkpoint_epoch(path) -> int:
    m = _EPOCH_RE.search(pathlib.Path(path).name)
    if not m:
        raise ValueError(f"not an epoch checkpoint: {path}")
    return int(m.group(1))


# ---------------------------------------------------------------------------
# Metric-monitored top-k checkpointing
# ---------------------------------------------------------------------------
#
# Reference: the 7 Lightning ModelCheckpoint presets under
# /root/reference/conf/callbacks/checkpoint/*.yaml — each monitors one logged
# metric and keeps the save_top_k best epochs. Here the monitored values are
# journaled to saved_models/monitor.json so `best_checkpoint` (and
# `evaluate.py --checkpoint best`) can pick the winner after the fact.


@dataclasses.dataclass(frozen=True)
class CheckpointPolicy:
    """What to monitor and how many checkpoints to keep (top_k=-1: keep all)."""

    monitor: Optional[str] = None
    mode: str = "min"  # "min" or "max"
    top_k: int = -1

    def __post_init__(self):
        if self.mode not in ("min", "max"):
            raise ValueError(f"mode must be min|max, got {self.mode!r}")


#: Mirrors conf/callbacks/checkpoint/*.yaml (metric keys translated to this
#: trainer's namespaced names; kl.yaml really is mode=max in the reference).
CHECKPOINT_PRESETS: Dict[str, CheckpointPolicy] = {
    "all": CheckpointPolicy(),
    "val_action": CheckpointPolicy("val/action_loss_pp", "min", -1),
    "lh_sr": CheckpointPolicy("eval_lh/avg_seq_len", "max", 3),
    "task_sr": CheckpointPolicy("tasks/average_sr", "max", 3),
    "kl": CheckpointPolicy("train/kl_loss", "max", 3),
    "clip_loss": CheckpointPolicy("val/val_pred_clip_loss", "min", 3),
    "state_recon": CheckpointPolicy("val/proprio_loss", "min", 3),
}


def resolve_checkpoint_policy(policy: Union[str, CheckpointPolicy, None]) -> CheckpointPolicy:
    if policy is None:
        return CHECKPOINT_PRESETS["all"]
    if isinstance(policy, CheckpointPolicy):
        return policy
    try:
        return CHECKPOINT_PRESETS[policy]
    except KeyError:
        raise ValueError(
            f"unknown checkpoint preset {policy!r}; choose from {sorted(CHECKPOINT_PRESETS)}"
        ) from None


class MonitoredCheckpointer:
    """Per-epoch orbax saves with optional top-k retention by a metric.

    The most recent checkpoint is always retained (fixed-run-dir auto-resume
    needs it, reference training.py:38-42); pruning applies to older epochs
    beyond the top-k best monitored values. Epochs saved while the monitored
    metric was absent (e.g. rollout metric before skip_epochs) carry no score
    and are pruned first.
    """

    def __init__(self, run_dir, policy: Union[str, CheckpointPolicy, None] = None):
        self.run_dir = pathlib.Path(run_dir)
        self.policy = resolve_checkpoint_policy(policy)
        self._journal_path = _ckpt_dir(run_dir) / "monitor.json"
        self._journal: Dict[str, Dict[str, float]] = {}
        if self._journal_path.exists():
            self._journal = json.loads(self._journal_path.read_text())

    def save(self, epoch: int, state: Dict[str, Any], metrics: Optional[Dict[str, float]] = None) -> pathlib.Path:
        path = save_checkpoint(self.run_dir, epoch, state)
        # journal ALL scalar metrics so any monitor can be queried post hoc
        self._journal[str(epoch)] = {
            k: float(v) for k, v in (metrics or {}).items() if isinstance(v, (int, float))
        }
        self._journal_path.parent.mkdir(parents=True, exist_ok=True)
        self._journal_path.write_text(json.dumps(self._journal, indent=2))
        self._prune()
        return path

    def _score(self, epoch: int) -> Optional[float]:
        return self._journal.get(str(epoch), {}).get(self.policy.monitor)

    def _prune(self) -> None:
        k = self.policy.top_k
        if k < 0 or self.policy.monitor is None:
            return
        ckpts = all_checkpoints(self.run_dir)
        if len(ckpts) <= k:
            return
        latest = ckpts[-1]
        sign = 1.0 if self.policy.mode == "min" else -1.0
        # rank by monitored value; unscored epochs sort last (pruned first)
        def rank(p):
            s = self._score(checkpoint_epoch(p))
            return (0, sign * s) if s is not None else (1, 0.0)

        keep = set(sorted(ckpts, key=rank)[:k])
        keep.add(latest)
        for p in ckpts:
            if p not in keep:
                shutil.rmtree(p)

    def best(self) -> Optional[pathlib.Path]:
        return best_checkpoint(self.run_dir, self.policy)


def best_checkpoint(run_dir, policy: Union[str, CheckpointPolicy, None] = None) -> Optional[pathlib.Path]:
    """The on-disk checkpoint with the best monitored value (falls back to the
    latest when no monitor journal exists — e.g. preset 'all')."""
    policy = resolve_checkpoint_policy(policy)
    journal_path = _ckpt_dir(run_dir) / "monitor.json"
    ckpts = all_checkpoints(run_dir)
    if not ckpts:
        return None
    if policy.monitor is None or not journal_path.exists():
        return ckpts[-1]
    journal = json.loads(journal_path.read_text())
    scored = [
        (journal.get(str(checkpoint_epoch(p)), {}).get(policy.monitor), p) for p in ckpts
    ]
    scored = [(s, p) for s, p in scored if s is not None]
    if not scored:
        return ckpts[-1]
    best_fn = min if policy.mode == "min" else max
    return best_fn(scored, key=lambda sp: sp[0])[1]
