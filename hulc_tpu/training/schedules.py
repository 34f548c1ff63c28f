"""KL-beta annealing + learning-rate schedules.

Reference: hulc/utils/kl_callbacks.py (constant/linear/sigmoid KL beta per
epoch, applied via set_kl_beta) and conf/model/lr_scheduler/* (constant /
cosine-with-warmup / linear-with-warmup, from the transformers library).

The KL beta is computed on host per epoch and passed as a *traced scalar*
into the jitted train step — annealing never triggers recompilation.
"""

from __future__ import annotations

import dataclasses
import math

import optax


@dataclasses.dataclass(frozen=True)
class KLSchedule:
    """kind: "constant" | "linear" | "sigmoid" (kl_callbacks.py)."""

    kind: str = "constant"
    start_epoch: int = 10
    end_epoch: int = 50
    max_kl_beta: float = 0.01

    def __call__(self, epoch: int, base_beta: float) -> float:
        if self.kind == "constant":
            return base_beta
        if epoch < self.start_epoch:
            return 0.0
        if epoch > self.end_epoch:
            return self.max_kl_beta
        if self.kind == "linear":
            frac = (epoch - self.start_epoch) / max(1, self.end_epoch - self.start_epoch)
            return self.max_kl_beta * frac
        if self.kind == "sigmoid":
            scale = self.end_epoch - self.start_epoch
            shift = (self.end_epoch + self.start_epoch) / 2
            return self.max_kl_beta / (1.0 + math.exp(-(epoch - shift) / (scale / 12)))
        raise ValueError(f"unknown KL schedule {self.kind!r}")


def make_lr_schedule(
    kind: str,
    lr: float,
    num_training_steps: int = -1,
    num_warmup_steps: float = 0.0,
) -> optax.Schedule:
    """kind: "constant" | "cosine_with_warmup" | "linear_with_warmup".

    Float num_warmup_steps is a fraction of num_training_steps (reference
    compute_warmup, hulc.py:218-237).
    """
    if kind == "constant":
        return optax.constant_schedule(lr)
    warmup = int(num_warmup_steps * num_training_steps) if isinstance(
        num_warmup_steps, float
    ) and num_warmup_steps < 1 else int(num_warmup_steps)
    if kind == "cosine_with_warmup":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(1, warmup),
            decay_steps=max(2, num_training_steps),
            end_value=0.0,
        )
    if kind == "linear_with_warmup":
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(1, warmup)),
                optax.linear_schedule(lr, 0.0, max(1, num_training_steps - warmup)),
            ],
            [max(1, warmup)],
        )
    raise ValueError(f"unknown lr schedule {kind!r}")
