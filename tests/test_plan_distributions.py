"""Plan distributions: shapes, straight-through gradients, KL properties."""

import numpy as np
import jax
import jax.numpy as jnp

from hulc_tpu.ops.plan_distributions import (
    ContinuousPlanState,
    DiscretePlanState,
    PlanDistribution,
)

DISC = PlanDistribution(kind="discrete", category_size=32, class_size=32)
CONT = PlanDistribution(kind="continuous", plan_features=256)


def test_dims():
    assert DISC.plan_dim == 1024 and DISC.state_dim == 1024
    assert CONT.plan_dim == 256 and CONT.state_dim == 512


def test_discrete_sample_is_onehot():
    logit = jax.random.normal(jax.random.key(0), (8, 1024))
    plan = DISC.sample(jax.random.key(1), DiscretePlanState(logit))
    assert plan.shape == (8, 1024)
    grid = np.asarray(plan).reshape(8, 32, 32)
    np.testing.assert_array_equal(grid.sum(-1), 1.0)
    assert set(np.unique(grid)) <= {0.0, 1.0}


def test_discrete_rsample_straight_through_grad():
    logit = jax.random.normal(jax.random.key(0), (4, 1024))

    def f(lg):
        plan = DISC.rsample(jax.random.key(1), DiscretePlanState(lg))
        return jnp.sum(plan**2)

    g = jax.grad(f)(logit)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0  # gradient flows through probs


def test_continuous_state_softplus_std():
    raw = jnp.concatenate([jnp.zeros((4, 256)), jnp.full((4, 256), -20.0)], -1)
    st = CONT.make_state(raw)
    assert np.all(np.asarray(st.std) > 0)


def test_kl_zero_for_identical():
    logit = jax.random.normal(jax.random.key(0), (8, 1024))
    st = DiscretePlanState(logit)
    kl = DISC.kl(st, st)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-5)

    mean = jax.random.normal(jax.random.key(1), (8, 256))
    std = jnp.ones((8, 256))
    cs = ContinuousPlanState(mean, std)
    np.testing.assert_allclose(np.asarray(CONT.kl(cs, cs)), 0.0, atol=1e-5)


def test_continuous_kl_closed_form():
    mean_p = jnp.zeros((1, 1))
    std_p = jnp.ones((1, 1))
    mean_q = jnp.full((1, 1), 1.0)
    std_q = jnp.full((1, 1), 2.0)
    dist = PlanDistribution(kind="continuous", plan_features=1)
    kl = float(dist.kl(ContinuousPlanState(mean_p, std_p), ContinuousPlanState(mean_q, std_q))[0])
    expected = np.log(2.0) + (1.0 + 1.0) / (2 * 4.0) - 0.5
    assert abs(kl - expected) < 1e-6


def test_balanced_kl_stopgrad_split():
    """alpha=1 -> no grad to posterior; alpha=0 -> no grad to prior."""
    k = jax.random.key(0)
    post_logit = jax.random.normal(k, (4, 1024))
    prior_logit = jax.random.normal(jax.random.key(1), (4, 1024))

    def loss(pl, ql, alpha):
        return DISC.balanced_kl(DiscretePlanState(pl), DiscretePlanState(ql), alpha)

    g_post = jax.grad(loss, argnums=0)(post_logit, prior_logit, 1.0)
    np.testing.assert_allclose(np.asarray(g_post), 0.0, atol=1e-8)
    g_prior = jax.grad(loss, argnums=1)(post_logit, prior_logit, 0.0)
    np.testing.assert_allclose(np.asarray(g_prior), 0.0, atol=1e-8)


def test_discrete_kl_matches_torch():
    import torch
    from torch.distributions import Categorical, Independent, OneHotCategorical
    from torch.distributions import kl_divergence

    p_logit = np.random.default_rng(0).normal(size=(8, 1024)).astype(np.float32)
    q_logit = np.random.default_rng(1).normal(size=(8, 1024)).astype(np.float32)
    ours = np.asarray(DISC.kl(DiscretePlanState(jnp.asarray(p_logit)), DiscretePlanState(jnp.asarray(q_logit))))

    tp = Independent(OneHotCategorical(logits=torch.from_numpy(p_logit).view(8, 32, 32)), 1)
    tq = Independent(OneHotCategorical(logits=torch.from_numpy(q_logit).view(8, 32, 32)), 1)
    theirs = kl_divergence(tp, tq).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
