"""Shared building blocks: MLPs, torch-style transformer encoder, scan RNNs.

TPU-first notes:
  * RNNs are ``lax.scan`` over time with the input projection hoisted out of
    the scan — one big (B*S, in) x (in, H) matmul feeds the MXU, the scan
    body only does the recurrent (B, H) x (H, H) matmul.
  * The transformer mirrors torch ``nn.TransformerEncoderLayer`` post-LN
    semantics (reference plan_recognition_net.py:113-116 uses the torch
    default norm_first=False) so converted checkpoints line up.
  * All params live in fp32; ``dtype`` controls intermediate compute
    (bfloat16 on TPU). LayerNorm/softmax accumulate in fp32.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

@jax.custom_vjp
def relu(x: Array) -> Array:
    """relu whose VJP recomputes the pass-through mask from the saved OUTPUT.

    jax.nn.relu materializes u32 masks in the backward; jnp.maximum(x, 0) is
    subtler but still costly: its JVP needs eq/gt predicates for gradient
    tie-splitting at x == 0, and XLA packs TWO u32 bitmask planes per
    activation into the forward fusions (~1.4 ms/step at the bench batch —
    diagnosed round 3 from the convert_reduce_fusion ops). This custom VJP
    saves only y (which the next layer stores anyway — XLA dedups) and
    computes ``g * (y > 0)`` in the backward: no forward-side mask
    materialization, and the x == 0 subgradient is 0 — exactly torch's
    relu'(0) = 0, unlike maximum's 0.5 split.
    """
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    # barrier: without it XLA hoists this compare into the FORWARD conv
    # fusion and bit-packs a u32 mask plane per activation (measured ~0.1 ms
    # per conv pair); behind the barrier the compare runs in the backward
    # against the stored y (which the wgrad reads anyway)
    y = jax.lax.optimization_barrier(y)
    return (g * (y > 0).astype(g.dtype),)


relu.defvjp(_relu_fwd, _relu_bwd)


ACTIVATIONS = {
    "relu": relu,
    "elu": nn.elu,
    "gelu": nn.gelu,
    "tanh": jnp.tanh,
}


class MLP(nn.Module):
    """Dense stack: hidden layers with activation, plain final layer."""

    features: Sequence[int]
    activation: str = "relu"
    dropout: float = 0.0
    final_activation: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        act = ACTIVATIONS[self.activation]
        if self.dropout > 0.0:
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < len(self.features) - 1 or self.final_activation:
                x = act(x)
        return x


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer (torch nn.TransformerEncoderLayer).

    x -> x + Dropout(SelfAttn(x)) -> LN -> + Dropout(FF(x)) -> LN
    """

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dtype=self.dtype,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="self_attn",
        )(x, x)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)

        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        ff = relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear2")(ff)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        return x


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers, optional final LayerNorm."""

    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    final_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                num_heads=self.num_heads,
                dim_feedforward=self.dim_feedforward,
                dropout=self.dropout,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
        if self.final_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="final_norm")(x)
        return x


# --------------------------------------------------------------------------
# Scan-based recurrent backbones with explicit carry (needed for stateful
# closed-loop inference — reference logistic_decoder_rnn.py:80,104-113).
# --------------------------------------------------------------------------


def _symmetric_uniform(bound: float):
    """U(-bound, bound) — torch's RNN/GRU/LSTM weight init. A one-sided
    [0, scale) init makes the relu-RNN recurrence explode exponentially."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class ScanRNN(nn.Module):
    """Multi-layer unidirectional RNN over (B, S, F) with explicit carry.

    cell: "rnn" (relu, the reference decoder's nn.RNN(nonlinearity=relu)),
    "rnn_tanh" (torch nn.RNN default — the reference MCIL BiRNN), "gru", or
    "lstm".
    Carry layout: (num_layers, B, H) for rnn/gru; a (h, c) tuple of that
    shape for lstm. Pass ``carry=None`` to start from zeros.

    The input-to-hidden projection for ALL timesteps is computed before the
    scan (one MXU-friendly matmul); the scan body contains only the
    recurrent matmul. All weights/biases use torch's U(-1/sqrt(H), 1/sqrt(H))
    so training dynamics match the reference.
    """

    hidden_size: int
    num_layers: int = 2
    cell: str = "rnn"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _gate_mult(self) -> int:
        return {"rnn": 1, "rnn_tanh": 1, "gru": 3, "lstm": 4}[self.cell]

    def init_carry(self, batch_size: int):
        shape = (self.num_layers, batch_size, self.hidden_size)
        h = jnp.zeros(shape, jnp.float32)
        if self.cell == "lstm":
            return (h, jnp.zeros(shape, jnp.float32))
        return h

    @nn.compact
    def __call__(
        self, x: Array, carry=None, *, deterministic: bool = True
    ) -> Tuple[Array, object]:
        if self.cell == "mlp":
            raise ValueError("use MLP module for the mlp decoder variant")
        b, s, _ = x.shape
        g = self._gate_mult()
        h_dim = self.hidden_size
        if carry is None:
            carry = self.init_carry(b)

        out = x
        new_h_layers = []
        new_c_layers = []
        bound = 1.0 / math.sqrt(h_dim)  # math, not jnp: must be concrete under jit
        for layer in range(self.num_layers):
            # Hoisted input projection: (B, S, g*H) in one matmul.
            x_proj = nn.Dense(
                g * h_dim,
                dtype=self.dtype,
                kernel_init=_symmetric_uniform(bound),
                bias_init=_symmetric_uniform(bound),
                name=f"ih_{layer}",
            )(out)
            w_hh = self.param(
                f"hh_{layer}", _symmetric_uniform(bound), (h_dim, g * h_dim), jnp.float32
            )
            b_hh = self.param(f"bhh_{layer}", _symmetric_uniform(bound), (g * h_dim,), jnp.float32)

            if self.cell == "lstm":
                h0 = (carry[0][layer], carry[1][layer])
            else:
                h0 = carry[layer]

            cell = self.cell
            # NOTE: the recurrent matmul stays fp32 deliberately — a bf16
            # variant (fp32 accumulate/carry) was measured at no speedup
            # (the backward's fp32 weight-grad accumulation dominates), so
            # full-precision relu-RNN dynamics are kept.

            def step(h, xp):
                if cell in ("rnn", "rnn_tanh"):
                    pre = xp + h @ w_hh + b_hh
                    new_h = relu(pre) if cell == "rnn" else jnp.tanh(pre)
                    return new_h, new_h
                if cell == "gru":
                    hp = h @ w_hh + b_hh
                    xr, xz, xn = jnp.split(xp, 3, -1)
                    hr, hz, hn = jnp.split(hp, 3, -1)
                    r = nn.sigmoid(xr + hr)
                    z = nn.sigmoid(xz + hz)
                    n = jnp.tanh(xn + r * hn)
                    new_h = (1.0 - z) * n + z * h
                    return new_h, new_h
                # lstm
                h_prev, c_prev = h
                hp = h_prev @ w_hh + b_hh
                xi, xf, xg, xo = jnp.split(xp, 4, -1)
                hi, hf, hg, ho = jnp.split(hp, 4, -1)
                i = nn.sigmoid(xi + hi)
                f = nn.sigmoid(xf + hf)
                gte = jnp.tanh(xg + hg)
                o = nn.sigmoid(xo + ho)
                c = f * c_prev + i * gte
                new_h = o * jnp.tanh(c)
                return (new_h, c), new_h

            # scan over time: inputs (S, B, g*H). unroll=8 merges loop
            # iterations so XLA pipelines the per-step matmuls (~0.6 ms/step
            # less while overhead at the bench batch; unroll=4 measured no
            # gain). Compile time grows with unrolling — the persistent
            # compilation cache amortizes it per machine.
            final, ys = jax.lax.scan(
                step, h0, jnp.swapaxes(x_proj, 0, 1).astype(jnp.float32), unroll=8
            )
            out = jnp.swapaxes(ys, 0, 1)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
            if self.cell == "lstm":
                new_h_layers.append(final[0])
                new_c_layers.append(final[1])
            else:
                new_h_layers.append(final)

        if self.cell == "lstm":
            new_carry = (jnp.stack(new_h_layers), jnp.stack(new_c_layers))
        else:
            new_carry = jnp.stack(new_h_layers)
        return out, new_carry


class ScanBiRNN(nn.Module):
    """Multi-layer bidirectional RNN (torch nn.RNN/GRU bidirectional=True).

    Output is (B, S, 2*H) — forward and backward concatenated per layer, and
    each subsequent layer consumes the previous layer's 2*H output, matching
    torch semantics (reference plan_recognition_net.py:22-30).
    """

    hidden_size: int
    num_layers: int = 2
    cell: str = "rnn"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        out = x
        for layer in range(self.num_layers):
            fwd = ScanRNN(
                self.hidden_size, 1, self.cell, 0.0, self.dtype, name=f"fwd_{layer}"
            )
            bwd = ScanRNN(
                self.hidden_size, 1, self.cell, 0.0, self.dtype, name=f"bwd_{layer}"
            )
            y_f, _ = fwd(out, deterministic=deterministic)
            y_b, _ = bwd(jnp.flip(out, axis=1), deterministic=deterministic)
            out = jnp.concatenate([y_f, jnp.flip(y_b, axis=1)], axis=-1)
            if self.dropout > 0.0 and layer < self.num_layers - 1:
                out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out
