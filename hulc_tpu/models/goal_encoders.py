"""Goal encoders (reference hulc/models/encoders/goal_encoders.py).

VisualGoalEncoder: MLP on the last-frame perceptual embedding (hindsight
goal, hulc.py:442). LanguageGoalEncoder: same MLP on the precomputed 384-d
sentence embedding, with optional word dropout. Both end in LayerNorm.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.config import GoalEncoderConfig
from hulc_tpu.models.layers import ACTIVATIONS

Array = jax.Array


class LanguageEncoder(nn.Module):
    """Plain-MLP language head (reference
    hulc/models/encoders/lang_encoder.py:6-29): Dropout on the input
    embedding, then three Dense layers with activations between — no final
    LayerNorm and no L2 normalization, unlike :class:`GoalEncoder`."""

    cfg: GoalEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.cfg.activation]
        if self.cfg.word_dropout > 0.0:
            x = nn.Dropout(self.cfg.word_dropout, deterministic=deterministic)(x)
        x = x.astype(self.dtype)
        x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc0")(x))
        x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(self.cfg.latent_goal_features, dtype=self.dtype, name="fc2")(x)


def make_language_goal_encoder(cfg: GoalEncoderConfig, dtype, name: str):
    """Select the language head per config (reference model/language_goal vs
    model/language_encoder config groups)."""
    if cfg.kind == "mlp":
        return LanguageEncoder(cfg, dtype=dtype, name=name)
    return GoalEncoder(cfg, word_dropout=True, dtype=dtype, name=name)


class GoalEncoder(nn.Module):
    cfg: GoalEncoderConfig
    word_dropout: bool = False

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.cfg.activation]
        if self.word_dropout and self.cfg.word_dropout > 0.0:
            x = nn.Dropout(self.cfg.word_dropout, deterministic=deterministic)(x)
        x = x.astype(self.dtype)
        x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc0")(x))
        x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc1")(x))
        x = nn.Dense(self.cfg.latent_goal_features, dtype=self.dtype, name="fc2")(x)
        if self.cfg.l2_normalize:
            x = x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln")(x)
