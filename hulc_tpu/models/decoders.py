"""Action decoders: RNN backbone + logistic-mixture or deterministic head.

Reference behavior: hulc/models/decoders/logistic_decoder_rnn.py and
deterministic_decoder.py, with the abstract contract of action_decoder.py
(loss / act / loss_and_act / clear_hidden_state).

TPU-first: the RNN is a ``lax.scan`` with explicit carry — closed-loop
inference threads the carry through the jitted policy step instead of the
reference's mutable ``self.hidden_state`` (logistic_decoder_rnn.py:80).
The three head projections run as one fused matmul each over (B, S); the
mixture NLL is the fused op from hulc_tpu.ops.logistic_mixture; TCP-frame
conversion stays in fp32.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hulc_tpu.config import ActionDecoderConfig
from hulc_tpu.models.layers import MLP, ScanRNN
from hulc_tpu.ops.frame_transforms import tcp_to_world_frame, world_to_tcp_frame
from hulc_tpu.ops.logistic_mixture import logistic_mixture_loss, logistic_mixture_sample

Array = jax.Array


class DecoderOutputs(NamedTuple):
    """Raw head outputs for one forward pass."""

    logit_probs: Array  # (B, S, A, K)
    log_scales: Array  # (B, S, A, K)
    means: Array  # (B, S, A, K)
    gripper_logits: Optional[Array]  # (B, S, 2) when discrete_gripper
    carry: object  # RNN carry after the pass


def decoder_carry(cfg: ActionDecoderConfig, batch_size: int):
    """Zero-initialized RNN carry for closed-loop inference (module-free)."""
    if cfg.rnn_cell == "mlp":
        return jnp.zeros((0,), jnp.float32)
    shape = (cfg.num_layers, batch_size, cfg.hidden_size)
    h = jnp.zeros(shape, jnp.float32)
    if cfg.rnn_cell == "lstm":
        return (h, jnp.zeros(shape, jnp.float32))
    return h


def _cross_entropy_gripper(
    gripper_logits: Array, gripper_gt: Array, per_sample: bool = False
) -> Array:
    """2-way CE on the discrete gripper channel; gt in {-1, 1} -> {0, 1}."""
    labels = (gripper_gt > 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(gripper_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if per_sample:
        return jnp.mean(nll, axis=tuple(range(1, nll.ndim)))
    return jnp.mean(nll)


class LogisticPolicyDecoder(nn.Module):
    """RNN + discretized logistic-mixture head (+ discrete gripper CE)."""

    cfg: ActionDecoderConfig
    dtype: jnp.dtype = jnp.float32

    @property
    def cont_dims(self) -> int:
        """Continuous action dims (gripper handled discretely if configured)."""
        return self.cfg.out_features - 1 if self.cfg.discrete_gripper else self.cfg.out_features

    def setup(self):
        c = self.cfg
        if c.rnn_cell == "mlp":
            self.rnn = MLP([c.hidden_size] * 3, final_activation=False, dtype=self.dtype, name="rnn")
        else:
            self.rnn = ScanRNN(
                hidden_size=c.hidden_size,
                num_layers=c.num_layers,
                cell=c.rnn_cell,
                dropout=c.rnn_dropout,
                dtype=self.dtype,
                name="rnn",
            )
        a = self.cont_dims
        self.mean_fc = nn.Dense(a * c.n_mixtures, dtype=jnp.float32, name="mean_fc")
        self.log_scale_fc = nn.Dense(a * c.n_mixtures, dtype=jnp.float32, name="log_scale_fc")
        self.prob_fc = nn.Dense(a * c.n_mixtures, dtype=jnp.float32, name="prob_fc")
        if c.discrete_gripper:
            self.gripper_fc = nn.Dense(2, dtype=jnp.float32, name="gripper_fc")

    def init_carry(self, batch_size: int):
        return decoder_carry(self.cfg, batch_size)

    def _bounds(self) -> Tuple[Array, Array]:
        c = self.cfg
        amax = jnp.asarray(c.act_max_bound, jnp.float32)
        amin = jnp.asarray(c.act_min_bound, jnp.float32)
        if c.discrete_gripper:
            amax, amin = amax[:-1], amin[:-1]
        return amin, amax

    def __call__(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        carry=None,
        *,
        deterministic: bool = True,
    ) -> DecoderOutputs:
        c = self.cfg
        if c.perceptual_emb_slice is not None:
            perceptual_emb = perceptual_emb[..., c.perceptual_emb_slice[0] : c.perceptual_emb_slice[1]]
        b, s, _ = perceptual_emb.shape
        parts = []
        if latent_plan.shape[-1] > 0:  # GCBC feeds an empty plan (gcbc.py:104)
            parts.append(jnp.broadcast_to(latent_plan[:, None], (b, s, latent_plan.shape[-1])))
        parts.append(perceptual_emb)
        parts.append(jnp.broadcast_to(latent_goal[:, None], (b, s, latent_goal.shape[-1])))
        x = jnp.concatenate([p.astype(self.dtype) for p in parts], axis=-1)

        if c.rnn_cell == "mlp":
            y, new_carry = self.rnn(x, deterministic=deterministic), carry
        else:
            y, new_carry = self.rnn(x, carry, deterministic=deterministic)

        a, k = self.cont_dims, c.n_mixtures
        logit_probs = self.prob_fc(y).reshape(b, s, a, k)
        means = self.mean_fc(y).reshape(b, s, a, k)
        log_scales = jnp.maximum(self.log_scale_fc(y).reshape(b, s, a, k), c.log_scale_min)
        gripper_logits = self.gripper_fc(y) if c.discrete_gripper else None
        return DecoderOutputs(logit_probs, log_scales, means, gripper_logits, new_carry)

    def _loss_from_outputs(
        self, out: DecoderOutputs, actions: Array, per_sample: bool = False
    ) -> Array:
        c = self.cfg
        amin, amax = self._bounds()
        if c.discrete_gripper:
            nll = logistic_mixture_loss(
                out.logit_probs, out.log_scales, out.means, actions[..., :-1],
                amin, amax, c.num_classes, c.log_scale_min, per_sample=per_sample,
            )
            gripper_loss = _cross_entropy_gripper(
                out.gripper_logits, actions[..., -1], per_sample=per_sample
            )
            return nll + c.gripper_alpha * gripper_loss
        return logistic_mixture_loss(
            out.logit_probs, out.log_scales, out.means, actions,
            amin, amax, c.num_classes, c.log_scale_min, per_sample=per_sample,
        )

    def _sample_from_outputs(self, rng: Array, out: DecoderOutputs) -> Array:
        c = self.cfg
        actions = logistic_mixture_sample(rng, out.logit_probs, out.log_scales, out.means)
        if c.discrete_gripper:
            bounds = jnp.asarray([c.act_min_bound[-1], c.act_max_bound[-1]], jnp.float32)
            gripper = bounds[jnp.argmax(out.gripper_logits, axis=-1)]
            actions = jnp.concatenate([actions, gripper[..., None]], axis=-1)
        return actions

    def loss(
        self,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        actions: Array,
        robot_obs: Array,
        *,
        deterministic: bool = True,
        per_sample: bool = False,
    ) -> Array:
        out = self(latent_plan, perceptual_emb, latent_goal, deterministic=deterministic)
        if self.cfg.gripper_control:
            actions = world_to_tcp_frame(actions, robot_obs)
        return self._loss_from_outputs(out, actions, per_sample=per_sample)

    def loss_and_act(
        self,
        rng: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        actions: Array,
        robot_obs: Array,
        *,
        deterministic: bool = True,
    ) -> Tuple[Array, Array]:
        out = self(latent_plan, perceptual_emb, latent_goal, deterministic=deterministic)
        pred = self._sample_from_outputs(rng, out)
        if self.cfg.gripper_control:
            loss = self._loss_from_outputs(out, world_to_tcp_frame(actions, robot_obs))
            return loss, tcp_to_world_frame(pred, robot_obs)
        return self._loss_from_outputs(out, actions), pred

    def act(
        self,
        rng: Array,
        latent_plan: Array,
        perceptual_emb: Array,
        latent_goal: Array,
        robot_obs: Array,
        carry,
    ) -> Tuple[Array, object]:
        """Single closed-loop step; carry replaces self.hidden_state."""
        out = self(latent_plan, perceptual_emb, latent_goal, carry, deterministic=True)
        pred = self._sample_from_outputs(rng, out)
        if self.cfg.gripper_control:
            pred = tcp_to_world_frame(pred, robot_obs)
        return pred, out.carry


class DeterministicPolicyDecoder(nn.Module):
    """RNN + tanh head, Huber/MSE loss (reference deterministic_decoder.py)."""

    cfg: ActionDecoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.rnn_cell == "mlp":
            self.rnn = MLP([c.hidden_size] * 3, final_activation=False, dtype=self.dtype, name="rnn")
        else:
            self.rnn = ScanRNN(
                hidden_size=c.hidden_size,
                num_layers=c.num_layers,
                cell=c.rnn_cell,
                dropout=c.rnn_dropout,
                dtype=self.dtype,
                name="rnn",
            )
        self.action_fc = nn.Dense(self.cfg.out_features, dtype=jnp.float32, name="action_fc")

    def init_carry(self, batch_size: int):
        return decoder_carry(self.cfg, batch_size)

    def __call__(self, latent_plan, perceptual_emb, latent_goal, carry=None, *, deterministic=True):
        c = self.cfg
        if c.perceptual_emb_slice is not None:
            perceptual_emb = perceptual_emb[..., c.perceptual_emb_slice[0] : c.perceptual_emb_slice[1]]
        b, s, _ = perceptual_emb.shape
        parts = []
        if latent_plan.shape[-1] > 0:
            parts.append(jnp.broadcast_to(latent_plan[:, None], (b, s, latent_plan.shape[-1])))
        parts.append(perceptual_emb)
        parts.append(jnp.broadcast_to(latent_goal[:, None], (b, s, latent_goal.shape[-1])))
        x = jnp.concatenate([p.astype(self.dtype) for p in parts], axis=-1)
        if c.rnn_cell == "mlp":
            y, new_carry = self.rnn(x, deterministic=deterministic), carry
        else:
            y, new_carry = self.rnn(x, carry, deterministic=deterministic)
        return jnp.tanh(self.action_fc(y)), new_carry

    def _criterion(self, pred: Array, target: Array, per_sample: bool = False) -> Array:
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if self.cfg.criterion == "huber":
            diff = pred - target
            absd = jnp.abs(diff)
            per_el = jnp.where(absd < 1.0, 0.5 * diff * diff, absd - 0.5)
        else:
            per_el = (pred - target) ** 2
        if per_sample:
            return jnp.mean(per_el, axis=tuple(range(1, per_el.ndim)))
        return jnp.mean(per_el)

    def loss(self, latent_plan, perceptual_emb, latent_goal, actions, robot_obs, *,
             deterministic=True, per_sample=False):
        pred, _ = self(latent_plan, perceptual_emb, latent_goal, deterministic=deterministic)
        # Note: the reference computes the TCP-frame criterion but then
        # *returns the world-frame one* (deterministic_decoder.py loss() —
        # the TCP result is discarded). We keep the world-frame loss.
        return self._criterion(pred, actions, per_sample=per_sample)

    def loss_and_act(self, rng, latent_plan, perceptual_emb, latent_goal, actions, robot_obs, *, deterministic=True):
        del rng  # deterministic head
        pred, _ = self(latent_plan, perceptual_emb, latent_goal, deterministic=deterministic)
        if self.cfg.gripper_control:
            loss = self._criterion(pred, world_to_tcp_frame(actions, robot_obs))
            return loss, tcp_to_world_frame(pred, robot_obs)
        return self._criterion(pred, actions), pred

    def act(self, rng, latent_plan, perceptual_emb, latent_goal, robot_obs, carry):
        del rng
        pred, new_carry = self(latent_plan, perceptual_emb, latent_goal, carry, deterministic=True)
        if self.cfg.gripper_control:
            pred = tcp_to_world_frame(pred, robot_obs)
        return pred, new_carry


def make_action_decoder(cfg: ActionDecoderConfig, dtype, name: str):
    if cfg.kind == "logistic":
        return LogisticPolicyDecoder(cfg, dtype, name=name)
    if cfg.kind == "deterministic":
        return DeterministicPolicyDecoder(cfg, dtype, name=name)
    raise ValueError(f"unknown action decoder kind {cfg.kind!r}")
