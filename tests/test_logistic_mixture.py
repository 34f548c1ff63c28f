"""Discretized logistic mixture: properties + parity with the reference loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hulc_tpu.ops.logistic_mixture import (
    logistic_mixture_log_prob,
    logistic_mixture_loss,
    logistic_mixture_sample,
)

A, K = 6, 10
BOUND_MIN = np.full((A,), -1.0, np.float32)
BOUND_MAX = np.full((A,), 1.0, np.float32)


def make_params(b=4, s=8, seed=0):
    rng = np.random.default_rng(seed)
    logit_probs = rng.normal(size=(b, s, A, K)).astype(np.float32)
    log_scales = rng.uniform(-5.0, 0.0, size=(b, s, A, K)).astype(np.float32)
    means = rng.uniform(-0.9, 0.9, size=(b, s, A, K)).astype(np.float32)
    actions = rng.uniform(-0.999, 0.999, size=(b, s, A)).astype(np.float32)
    return logit_probs, log_scales, means, actions


def test_log_prob_finite_and_negative_loss_positive():
    lp, ls, mu, act = make_params()
    out = logistic_mixture_log_prob(lp, ls, mu, act, BOUND_MIN, BOUND_MAX, num_classes=10)
    assert out.shape == (4, 8, A)
    assert np.isfinite(np.asarray(out)).all()
    loss = logistic_mixture_loss(lp, ls, mu, act, BOUND_MIN, BOUND_MAX, num_classes=10)
    assert np.isfinite(float(loss))


def test_edge_actions_finite():
    lp, ls, mu, _ = make_params(seed=1)
    for v in (-1.0, 1.0):
        act = np.full((4, 8, A), v, np.float32)
        out = logistic_mixture_log_prob(lp, ls, mu, act, BOUND_MIN, BOUND_MAX, num_classes=10)
        assert np.isfinite(np.asarray(out)).all()


def test_tight_mixture_gets_high_likelihood():
    """A mixture sharply peaked on the action should beat a diffuse one."""
    b, s = 2, 4
    act = np.zeros((b, s, A), np.float32)
    lp = np.zeros((b, s, A, K), np.float32)
    mu_good = np.zeros((b, s, A, K), np.float32)
    mu_bad = np.full((b, s, A, K), 0.9, np.float32)
    ls = np.full((b, s, A, K), -4.0, np.float32)
    good = logistic_mixture_loss(lp, ls, mu_good, act, BOUND_MIN, BOUND_MAX, 10)
    bad = logistic_mixture_loss(lp, ls, mu_bad, act, BOUND_MIN, BOUND_MAX, 10)
    assert float(good) < float(bad)


def test_sampling_statistics():
    """Samples from a single tight component should concentrate on its mean."""
    b = 4096
    lp = np.zeros((b, A, K), np.float32)
    lp[..., 0] = 20.0  # force component 0
    mu = np.zeros((b, A, K), np.float32)
    mu[..., 0] = 0.5
    ls = np.full((b, A, K), -6.0, np.float32)
    out = logistic_mixture_sample(jax.random.key(0), jnp.asarray(lp), jnp.asarray(ls), jnp.asarray(mu))
    out = np.asarray(out)
    assert abs(out.mean() - 0.5) < 0.01
    assert out.std() < 0.02


def test_parity_with_reference_loss():
    """Bit-level parity of the NLL math with logistic_decoder_rnn._logistic_loss."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    lp, ls, mu, act = make_params(seed=3)
    ours = float(logistic_mixture_loss(lp, ls, mu, act, BOUND_MIN, BOUND_MAX, num_classes=10, log_scale_min=-7.0))

    # Independent re-derivation of the reference math in torch (no code copied):
    t_lp, t_ls, t_mu = map(torch.from_numpy, (lp, ls, mu))
    t_act = torch.from_numpy(act).unsqueeze(-1).expand_as(t_mu)
    t_ls = torch.clamp(t_ls, min=-7.0)
    amax = torch.from_numpy(BOUND_MAX).view(1, 1, A, 1)
    amin = torch.from_numpy(BOUND_MIN).view(1, 1, A, 1)
    act_range = (amax - amin) / 2.0
    centered = t_act - t_mu
    inv_stdv = torch.exp(-t_ls)
    plus_in = inv_stdv * (centered + act_range / 9)
    min_in = inv_stdv * (centered - act_range / 9)
    log_cdf_plus = plus_in - F.softplus(plus_in)
    log_om_cdf_min = -F.softplus(min_in)
    cdf_delta = torch.sigmoid(plus_in) - torch.sigmoid(min_in)
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - t_ls - 2.0 * F.softplus(mid_in)
    log_probs = torch.where(
        t_act < amin + 1e-3,
        log_cdf_plus,
        torch.where(
            t_act > amax - 1e-3,
            log_om_cdf_min,
            torch.where(
                cdf_delta > 1e-5,
                torch.log(torch.clamp(cdf_delta, min=1e-12)),
                log_pdf_mid - np.log(9 / 2),
            ),
        ),
    )
    log_probs = log_probs + F.log_softmax(t_lp, dim=-1)
    theirs = float(-torch.logsumexp(log_probs, dim=-1).sum(-1).mean())
    assert abs(ours - theirs) < 1e-4
