"""Serving: AOT-exported policy artifacts (StableHLO) + model-code-free runtime.

``ServedPolicy``/``ServedBatchedPolicy`` import eagerly (jax + numpy only);
``export_policy`` is lazy so serving hosts never import the flax model stack.
"""

from hulc_tpu.serving.params_io import flatten_params, unflatten_params
from hulc_tpu.serving.runtime import ServedBatchedPolicy, ServedPolicy

__all__ = [
    "export_policy",
    "flatten_params",
    "unflatten_params",
    "ServedPolicy",
    "ServedBatchedPolicy",
]


def __getattr__(name):
    if name == "export_policy":
        from hulc_tpu.serving.export import export_policy

        return export_policy
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
