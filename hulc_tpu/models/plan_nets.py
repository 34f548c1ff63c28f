"""Latent-plan networks: proposal prior MLP + recognition posterior.

Reference behavior:
  * PlanProposalNetwork (plan_proposal_net.py): 4x2048 MLP on
    concat(perceptual_emb[:, 0], latent_goal) -> plan state.
  * PlanRecognitionTransformersNetwork (plan_recognition_net.py:45-117):
    learned position embeddings, 2-layer/8-head post-LN transformer, FC to
    4096-d seq_feat (mean-pooled over time) -> plan state. Input is
    zero-padded up to a multiple of num_heads.
  * PlanRecognitionBiRNNNetwork (plan_recognition_net.py:12-42): 2x2048
    bidirectional RNN, last-step output -> plan state (MCIL variant).
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.config import DistributionConfig, PlanProposalConfig, PlanRecognitionConfig
from hulc_tpu.models.layers import ACTIVATIONS, ScanBiRNN, TransformerEncoder
from hulc_tpu.ops.plan_distributions import PlanDistribution, PlanState

Array = jax.Array


def make_plan_distribution(cfg: DistributionConfig) -> PlanDistribution:
    return PlanDistribution(
        kind=cfg.kind,
        category_size=cfg.category_size,
        class_size=cfg.class_size,
        plan_features=cfg.plan_features,
    )


class PlanProposalNetwork(nn.Module):
    """Prior: p(plan | s_0, goal)."""

    cfg: PlanProposalConfig
    dist: PlanDistribution
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, initial_percep_emb: Array, latent_goal: Array) -> PlanState:
        act = ACTIVATIONS[self.cfg.activation]
        x = jnp.concatenate([initial_percep_emb, latent_goal], axis=-1).astype(self.dtype)
        for i in range(self.cfg.num_layers):
            x = act(nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name=f"fc_{i}")(x))
        state = nn.Dense(self.dist.state_dim, dtype=jnp.float32, name="fc_state")(x)
        return self.dist.make_state(state)


def sinusoidal_position_encoding(seq_len: int, d_model: int) -> Array:
    """Classic sinusoidal PE (reference plan_recognition_net.py:230-246)."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((seq_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    cos_term = jnp.cos(position * (div_term if d_model % 2 == 0 else div_term[:-1]))
    pe = pe.at[:, 1::2].set(cos_term)
    return pe


class PlanRecognitionTransformer(nn.Module):
    """Posterior: q(plan | full window) + seq_feat for language aux losses."""

    cfg: PlanRecognitionConfig
    dist: PlanDistribution
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, perceptual_emb: Array, *, deterministic: bool = True) -> Tuple[PlanState, Array]:
        b, s, f = perceptual_emb.shape
        pad = (-f) % self.cfg.num_heads
        x = perceptual_emb
        if pad:
            x = jnp.concatenate([x, jnp.zeros((b, s, pad), x.dtype)], axis=-1)
        d_model = f + pad

        if self.cfg.position_embedding:
            pos_emb = self.param(
                "position_embeddings",
                nn.initializers.normal(stddev=0.02),
                (self.cfg.max_position_embeddings, d_model),
                jnp.float32,
            )
            x = x + pos_emb[:s][None]
        else:
            x = x + sinusoidal_position_encoding(s, d_model)[None]
        if self.cfg.positional_normalize:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="positional_norm")(x)
        x = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(x)
        x = TransformerEncoder(
            num_layers=self.cfg.num_layers,
            num_heads=self.cfg.num_heads,
            dim_feedforward=self.cfg.encoder_hidden_size,
            dropout=self.cfg.dropout,
            final_norm=self.cfg.encoder_normalize,
            dtype=self.dtype,
            name="encoder",
        )(x, deterministic=deterministic)
        x = nn.Dense(self.cfg.fc_hidden_size, dtype=self.dtype, name="fc")(x)
        seq_feat = jnp.mean(x.astype(jnp.float32), axis=1)  # (B, fc_hidden)
        state = nn.Dense(self.dist.state_dim, dtype=jnp.float32, name="fc_state")(seq_feat)
        return self.dist.make_state(state), seq_feat


class PlanRecognitionBiRNN(nn.Module):
    """MCIL posterior: bidirectional RNN, last-step features."""

    cfg: PlanRecognitionConfig
    dist: PlanDistribution
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, perceptual_emb: Array, *, deterministic: bool = True) -> Tuple[PlanState, Array]:
        x = ScanBiRNN(
            hidden_size=self.cfg.birnn_hidden_size,
            num_layers=self.cfg.birnn_num_layers,
            cell=self.cfg.birnn_cell,
            dropout=self.cfg.birnn_dropout,
            dtype=self.dtype,
            name="birnn",
        )(perceptual_emb, deterministic=deterministic)
        seq_feat = x[:, -1].astype(jnp.float32)  # (B, 2*hidden)
        state = nn.Dense(self.dist.state_dim, dtype=jnp.float32, name="fc_state")(seq_feat)
        return self.dist.make_state(state), seq_feat


def make_plan_recognition(cfg: PlanRecognitionConfig, dist: PlanDistribution, dtype, name: str):
    if cfg.kind == "transformer":
        return PlanRecognitionTransformer(cfg, dist, dtype, name=name)
    if cfg.kind == "birnn":
        return PlanRecognitionBiRNN(cfg, dist, dtype, name=name)
    raise ValueError(f"unknown plan recognition kind {cfg.kind!r}")
