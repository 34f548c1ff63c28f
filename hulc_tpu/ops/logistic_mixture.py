"""Discretized logistic mixture NLL and sampling (PixelCNN++-style).

Reference behavior: hulc/models/decoders/logistic_decoder_rnn.py:184-258.
The HULC action head parameterizes each continuous action dimension with a
mixture of ``n_mixtures`` discretized logistics over ``num_classes`` bins
between per-dimension action bounds. Loss is the negative log likelihood of
the discretized bin; sampling is a Gumbel mixture choice followed by
logistic inversion sampling.

Written as fused jnp expressions so XLA folds the whole head (three
projections + NLL) into a handful of kernels; kept in fp32 — the corner-case
``log(cdf_delta)`` math underflows in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def logistic_mixture_log_prob(
    logit_probs: Array,
    log_scales: Array,
    means: Array,
    actions: Array,
    act_min_bound: Array,
    act_max_bound: Array,
    num_classes: int,
    log_scale_min: float = -7.0,
) -> Array:
    """Per-(sample, dim) log-likelihood of actions under the mixture.

    Args:
      logit_probs: (..., A, K) unnormalized mixture weights.
      log_scales: (..., A, K) log scales (clamped to log_scale_min).
      means: (..., A, K) mixture means.
      actions: (..., A) ground-truth continuous actions.
      act_min_bound / act_max_bound: (A,) per-dimension bounds.
      num_classes: number of discretization bins.

    Returns:
      (..., A) log prob per action dimension (already mixture-reduced).
    """
    dtype = jnp.float32
    logit_probs = logit_probs.astype(dtype)
    log_scales = jnp.maximum(log_scales.astype(dtype), log_scale_min)
    means = means.astype(dtype)
    actions = actions.astype(dtype)[..., None]  # (..., A, 1) broadcast over K

    act_max = jnp.asarray(act_max_bound, dtype)[..., :, None]  # (A, 1)
    act_min = jnp.asarray(act_min_bound, dtype)[..., :, None]
    act_range = (act_max - act_min) / 2.0
    bin_half_width = act_range / (num_classes - 1)

    centered = actions - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + bin_half_width)
    min_in = inv_stdv * (centered - bin_half_width)

    # Edge-bin log probabilities and interior bin mass.
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid(plus_in)
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)  # log(1 - sigmoid(min_in))
    cdf_delta = jax.nn.sigmoid(plus_in) - jax.nn.sigmoid(min_in)
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    log_probs = jnp.where(
        actions < act_min + 1e-3,
        log_cdf_plus,
        jnp.where(
            actions > act_max - 1e-3,
            log_one_minus_cdf_min,
            jnp.where(
                cdf_delta > 1e-5,
                jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
            ),
        ),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return jax.nn.logsumexp(log_probs, axis=-1)  # reduce mixture dim


def logistic_mixture_loss(
    logit_probs: Array,
    log_scales: Array,
    means: Array,
    actions: Array,
    act_min_bound: Array,
    act_max_bound: Array,
    num_classes: int,
    log_scale_min: float = -7.0,
    per_sample: bool = False,
) -> Array:
    """NLL: -mean over batch/time of the per-sample sum over dims.

    Matches the reference reduction (logistic_decoder_rnn.py:230):
    ``-sum_over_dims(logsumexp).mean()``. With ``per_sample=True`` the
    batch dim stays: returns (B,) with the mean taken over time/dims only
    (``mean(result) == scalar form``) — used by the fused dual-modality
    training path to recover per-modality losses from one batched pass.
    """
    lp = logistic_mixture_log_prob(
        logit_probs, log_scales, means, actions, act_min_bound, act_max_bound, num_classes, log_scale_min
    )
    nll = -jnp.sum(lp, axis=-1)  # (B, S)
    if per_sample:
        return jnp.mean(nll, axis=tuple(range(1, nll.ndim)))
    return jnp.mean(nll)


def logistic_mixture_sample(
    rng: Array,
    logit_probs: Array,
    log_scales: Array,
    means: Array,
) -> Array:
    """Sample actions: Gumbel mixture choice + logistic inversion sampling.

    Args:
      rng: PRNG key.
      logit_probs / log_scales / means: (..., A, K).

    Returns:
      (..., A) sampled continuous actions.
    """
    dtype = jnp.float32
    logit_probs = logit_probs.astype(dtype)
    log_scales = log_scales.astype(dtype)
    means = means.astype(dtype)
    k_mix, k_inv = jax.random.split(rng)
    r1, r2 = 1e-5, 1.0 - 1e-5

    # Gumbel-max over the mixture dimension (reference samples u in (r1, r2)).
    u = jax.random.uniform(k_mix, logit_probs.shape, dtype, minval=r1, maxval=r2)
    idx = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    one_hot = jax.nn.one_hot(idx, logit_probs.shape[-1], dtype=dtype)

    sel_log_scales = jnp.sum(one_hot * log_scales, axis=-1)
    sel_means = jnp.sum(one_hot * means, axis=-1)

    u2 = jax.random.uniform(k_inv, sel_means.shape, dtype, minval=r1, maxval=r2)
    return sel_means + jnp.exp(sel_log_scales) * (jnp.log(u2) - jnp.log(1.0 - u2))
