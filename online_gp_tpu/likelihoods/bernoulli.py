"""Bernoulli (probit) likelihood for variational GP classification.

The reference's O-SVGP classifier uses gpytorch's ``BernoulliLikelihood``
(``online_gp/models/online_svgp_classifier.py:24-30``): a probit link with
the classic closed forms —

  predictive p(y=1 | mu, s2) = Phi( mu / sqrt(1 + s2) )
  E_q[log p(y|f)]  via Gauss–Hermite quadrature (fixed node count, so the
  expected log-likelihood stays a static jittable sum).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_GH_NODES = 32
_gh_x, _gh_w = np.polynomial.hermite_e.hermegauss(_GH_NODES)  # weight e^{-x^2/2}
_gh_w = _gh_w / np.sqrt(2.0 * np.pi)


def _log_probit(z: jnp.ndarray) -> jnp.ndarray:
    return jax.scipy.stats.norm.logcdf(z)


def bernoulli_probit_expected_log_prob(
    y: jnp.ndarray, mean: jnp.ndarray, var: jnp.ndarray
) -> jnp.ndarray:
    """E_{f ~ N(mean, var)}[log Bernoulli(y | Phi(f))] per point.

    Args:
      y: (...,) in {0, 1} (or {-1, +1}); mean, var: (...,).
    """
    sign = jnp.where(y > 0.5, 1.0, -1.0)
    x = jnp.asarray(_gh_x, mean.dtype)
    w = jnp.asarray(_gh_w, mean.dtype)
    f = mean[..., None] + jnp.sqrt(jnp.maximum(var, 1e-12))[..., None] * x
    return jnp.sum(w * _log_probit(sign[..., None] * f), axis=-1)


def bernoulli_probit_predictive(mean: jnp.ndarray, var: jnp.ndarray) -> jnp.ndarray:
    """p(y = 1) = Phi(mu / sqrt(1 + s2))."""
    return jax.scipy.stats.norm.cdf(mean / jnp.sqrt(1.0 + var))
