"""Latent-plan distributions: discrete straight-through categorical grid or
diagonal Normal, with DreamerV2-style balanced KL.

Reference behavior: hulc/utils/distributions.py and hulc/models/hulc.py:539-561.
The plan space is either
  * ``discrete``: ``category_size`` independent categoricals over
    ``class_size`` classes (default 32x32 -> 1024-d flattened one-hot plan),
    reparameterized with the straight-through estimator, or
  * ``continuous``: a diagonal Normal with softplus std (default 256-d).

Everything is a pure function over a ``PlanState`` namedtuple — no
distribution objects, no data-dependent Python control flow; the
discrete/continuous switch is static config so jit traces exactly one branch.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


class DiscretePlanState(NamedTuple):
    """Unnormalized logits, flattened: (..., category_size * class_size)."""

    logit: Array


class ContinuousPlanState(NamedTuple):
    mean: Array
    std: Array


PlanState = Union[DiscretePlanState, ContinuousPlanState]


@dataclasses.dataclass(frozen=True)
class PlanDistribution:
    """Static config + pure ops for the latent plan space.

    kind: "discrete" or "continuous".
    For discrete: category_size x class_size grid (plan dim = product).
    For continuous: plan_features Normal dims (plan dim = plan_features).
    """

    kind: str = "discrete"
    category_size: int = 32
    class_size: int = 32
    plan_features: int = 256
    min_std: float = 1e-4

    def __post_init__(self):
        if self.kind not in ("discrete", "continuous"):
            raise ValueError(f"invalid plan distribution kind {self.kind}")

    @property
    def plan_dim(self) -> int:
        """Width of the flattened sampled plan fed to the action decoder."""
        if self.kind == "discrete":
            return self.category_size * self.class_size
        return self.plan_features

    @property
    def state_dim(self) -> int:
        """Output width the state-projection layer must produce."""
        if self.kind == "discrete":
            return self.category_size * self.class_size
        return 2 * self.plan_features

    def make_state(self, x: Array) -> PlanState:
        """Project raw net output (..., state_dim) to a PlanState.

        Reference: distributions.py forward_dist (softplus std + min_std).
        """
        if self.kind == "discrete":
            return DiscretePlanState(logit=x)
        mean, var = jnp.split(x, 2, axis=-1)
        std = jax.nn.softplus(var.astype(jnp.float32)) + self.min_std
        return ContinuousPlanState(mean=mean.astype(jnp.float32), std=std)

    def _grid_logits(self, state: DiscretePlanState) -> Array:
        s = state.logit.astype(jnp.float32)
        return s.reshape(s.shape[:-1] + (self.category_size, self.class_size))

    def stop_gradient(self, state: PlanState) -> PlanState:
        return jax.tree.map(jax.lax.stop_gradient, state)

    def sample(self, rng: Array, state: PlanState) -> Array:
        """Non-reparameterized sample, flattened to (..., plan_dim)."""
        if self.kind == "discrete":
            logits = self._grid_logits(state)
            idx = jax.random.categorical(rng, logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.class_size, dtype=jnp.float32)
            return one_hot.reshape(one_hot.shape[:-2] + (self.plan_dim,))
        eps = jax.random.normal(rng, state.mean.shape, dtype=jnp.float32)
        return jax.lax.stop_gradient(state.mean + state.std * eps)

    def rsample(self, rng: Array, state: PlanState) -> Array:
        """Reparameterized sample (straight-through for discrete)."""
        if self.kind == "discrete":
            logits = self._grid_logits(state)
            idx = jax.random.categorical(rng, logits, axis=-1)
            one_hot = jax.nn.one_hot(idx, self.class_size, dtype=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            st = one_hot + probs - jax.lax.stop_gradient(probs)
            return st.reshape(st.shape[:-2] + (self.plan_dim,))
        eps = jax.random.normal(rng, state.mean.shape, dtype=jnp.float32)
        return state.mean + state.std * eps

    def mode(self, state: PlanState) -> Array:
        """Deterministic plan (argmax one-hot / mean), flattened."""
        if self.kind == "discrete":
            logits = self._grid_logits(state)
            one_hot = jax.nn.one_hot(jnp.argmax(logits, -1), self.class_size, dtype=jnp.float32)
            return one_hot.reshape(one_hot.shape[:-2] + (self.plan_dim,))
        return state.mean

    def kl(self, p: PlanState, q: PlanState) -> Array:
        """KL(p || q) per batch element (sum over plan dims), fp32."""
        if self.kind == "discrete":
            lp = jax.nn.log_softmax(self._grid_logits(p), axis=-1)
            lq = jax.nn.log_softmax(self._grid_logits(q), axis=-1)
            per_cat = jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)
            return jnp.sum(per_cat, axis=-1)
        pm, ps = p.mean.astype(jnp.float32), p.std.astype(jnp.float32)
        qm, qs = q.mean.astype(jnp.float32), q.std.astype(jnp.float32)
        per_dim = (
            jnp.log(qs / ps) + (ps**2 + (pm - qm) ** 2) / (2.0 * qs**2) - 0.5
        )
        return jnp.sum(per_dim, axis=-1)

    def balanced_kl(
        self, posterior: PlanState, prior: PlanState, alpha: float, per_sample: bool = False
    ) -> Array:
        """DreamerV2 KL balancing (hulc.py:539-561), mean over batch.

        alpha * KL(sg[post] || prior) + (1 - alpha) * KL(post || sg[prior]).
        per_sample=True keeps the batch dim (mean of it == scalar form).
        """
        kl_lhs = self.kl(self.stop_gradient(posterior), prior)
        kl_rhs = self.kl(posterior, self.stop_gradient(prior))
        out = alpha * kl_lhs + (1.0 - alpha) * kl_rhs
        return out if per_sample else jnp.mean(out)
