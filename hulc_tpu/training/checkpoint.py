"""Orbax checkpointing with the reference's resume semantics.

Reference: Lightning ModelCheckpoint writing ``saved_models/{epoch}.ckpt``
and resuming from the latest checkpoint in a fixed run dir
(training.py:38-46, SURVEY.md §5). Here: one orbax directory per epoch under
``<run_dir>/saved_models/epoch_<N>`` holding params + opt_state + counters;
``latest_checkpoint``/``all_checkpoints`` mirror
calvin_agent.utils.get_last_checkpoint / get_all_checkpoints.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any, Dict, List, Optional

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
    with ocp.StandardCheckpointer() as restorer:
        return restorer.restore(pathlib.Path(path).absolute(), template)


def restore_params(path, params_template) -> Any:
    """Restore only the params subtree (evaluation does not need opt_state)."""
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as restorer:
        restored = restorer.restore(pathlib.Path(path).absolute())
    import jax

    flat_template, treedef = jax.tree_util.tree_flatten(params_template)
    flat_restored = jax.tree_util.tree_leaves(restored["params"])
    if len(flat_template) != len(flat_restored):
        raise ValueError(
            f"checkpoint params leaves ({len(flat_restored)}) do not match "
            f"template ({len(flat_template)})"
        )
    return jax.tree_util.tree_unflatten(treedef, flat_restored)


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
