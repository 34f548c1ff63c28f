"""Serving: AOT-exported policy artifacts (StableHLO) + model-code-free runtime."""

from hulc_tpu.serving.export import export_policy, flatten_params, unflatten_params
from hulc_tpu.serving.runtime import ServedBatchedPolicy, ServedPolicy

__all__ = [
    "export_policy",
    "flatten_params",
    "unflatten_params",
    "ServedPolicy",
    "ServedBatchedPolicy",
]
