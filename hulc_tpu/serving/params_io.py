"""Flat param-tree (de)serialization for serving artifacts.

Dependency-free on purpose: the serving runtime (runtime.py) must be
importable on hosts with NO flax/model/config code — only jax + numpy.
Both the exporter and the runtime import these helpers from here.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def flatten_params(params) -> Dict[str, np.ndarray]:
    """Nested param dict -> flat {'a/b/kernel': array} (npz-serializable)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray]):
    """Inverse of :func:`flatten_params` for plain nested dicts."""
    params: Dict = {}
    for key, leaf in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(leaf)
    return params
