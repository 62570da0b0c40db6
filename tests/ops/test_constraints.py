"""Interval-constrained hyperparameter reparameterization.

The reference's BO/AL surrogates bound lengthscale/outputscale with
gpytorch ``Interval(1e-4, 12.0)`` (``experiments/bayesopt/bayesopt.py:66-75``);
here the analog is a sigmoid-interval raw->constrained transform on the
kernel (``kernels/base.py::IntervalTransform``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.kernels import (
    GammaPrior,
    IntervalTransform,
    log_prior_sum,
    make_kernel,
)


def test_interval_transform_round_trip_and_bounds():
    tf = IntervalTransform(1e-4, 12.0)
    for v in (1e-3, 0.5, 1.0, 11.9):
        raw = tf.inverse(v)
        assert np.isclose(float(tf.forward(jnp.asarray(raw))), v, rtol=1e-6)
    # forward always lands strictly inside the interval
    for raw in (-50.0, -1.0, 0.0, 1.0, 50.0):
        out = float(tf.forward(jnp.asarray(raw)))
        assert 1e-4 <= out <= 12.0
    with pytest.raises(ValueError):
        tf.inverse(13.0)


def test_constrained_kernel_matches_unconstrained_at_same_hypers():
    """Same constrained (lengthscale, outputscale) => identical matrices."""
    k_free = make_kernel("matern52")
    k_box = make_kernel("matern52").constrain(
        lengthscale_bounds=(1e-4, 12.0), outputscale_bounds=(1e-4, 12.0)
    )
    p_free = k_free.init_params(3, lengthscale=0.7, outputscale=1.3)
    p_box = k_box.init_params(3, lengthscale=0.7, outputscale=1.3)
    # raw params differ (different reparams) ...
    assert not np.allclose(
        np.asarray(p_free["raw_lengthscale"]), np.asarray(p_box["raw_lengthscale"])
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
    z = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    # ... but the kernel matrices agree
    np.testing.assert_allclose(
        np.asarray(k_free.matrix(p_free, x, z)),
        np.asarray(k_box.matrix(p_box, x, z)),
        rtol=1e-5, atol=1e-6,
    )
    # grid factors go through the same transform
    g = jnp.linspace(-1.0, 1.0, 9)
    np.testing.assert_allclose(
        np.asarray(k_free.factor_1d(p_free, 1, g, True)),
        np.asarray(k_box.factor_1d(p_box, 1, g, True)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(k_free.factor_col(p_free, 0, g, False)),
        np.asarray(k_box.factor_col(p_box, 0, g, False)),
        rtol=1e-5, atol=1e-6,
    )


def test_constrained_values_stay_in_box_under_extreme_raw():
    k = make_kernel("matern52").constrain(
        lengthscale_bounds=(1e-4, 12.0), outputscale_bounds=(1e-4, 12.0)
    )
    p = k.init_params(2)
    p["raw_lengthscale"] = jnp.full_like(p["raw_lengthscale"], 1e3)
    p["raw_outputscale"] = jnp.full_like(p["raw_outputscale"], -1e3)
    ls = np.asarray(k.lengthscale(p))
    os_ = np.asarray(k.outputscale(p))
    assert (ls <= 12.0).all() and (ls >= 1e-4).all()
    assert (os_ <= 12.0).all() and (os_ >= 1e-4).all()


def test_log_prior_sum_uses_kernel_transforms():
    """Priors evaluate on the constrained value, not exp(raw)."""
    k = make_kernel("matern52").constrain(lengthscale_bounds=(1e-4, 12.0))
    p = k.init_params(1, lengthscale=0.5)
    priors = {"raw_lengthscale": GammaPrior(3.0, 6.0)}
    got = float(log_prior_sum(priors, p, k.transforms))
    want = float(GammaPrior(3.0, 6.0).log_prob(jnp.asarray(0.5)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # default (no transforms) keeps the exp semantics
    got_exp = float(log_prior_sum(priors, p))
    want_exp = float(
        GammaPrior(3.0, 6.0).log_prob(jnp.exp(p["raw_lengthscale"])).sum()
    )
    np.testing.assert_allclose(got_exp, want_exp, rtol=1e-5)


def test_constrained_kernel_gradients_finite_at_bounds():
    """Optimizing raw params near saturation must not produce NaNs."""
    k = make_kernel("rbf").constrain(
        lengthscale_bounds=(1e-4, 12.0), outputscale_bounds=(1e-4, 12.0)
    )
    p = k.init_params(2, lengthscale=11.99, outputscale=0.001)
    x = jax.random.normal(jax.random.PRNGKey(2), (6, 2))

    def loss(pp):
        return jnp.sum(k.matrix(pp, x, x))

    g = jax.grad(loss)(p)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
