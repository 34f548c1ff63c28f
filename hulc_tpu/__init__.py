"""hulc_tpu: TPU-native HULC — hierarchical language-conditioned policies.

Public surface:
    config.get_config          named model presets
    models.make_model          flax HulcModel from a config
    training.trainer.Trainer   pjit data-parallel training
    training.torch_convert     reference checkpoint conversion
    evaluation.policy.HulcPolicy      closed-loop inference (reset/step)
    evaluation.lh_eval.evaluate_policy    LH-MTLC protocol
    evaluation.batched_eval.evaluate_policy_batched   lockstep variant
"""

__version__ = "0.1.0"

from hulc_tpu.config import get_config  # noqa: F401
