"""Gaussian likelihood helpers.

The reference's ``FNMGLikelihood``
(``online_gp/likelihoods/fnmg_likelihood.py``) is a fixed-noise Gaussian
whose learnable "second noise" is *multiplicative*: the observation noise
is ``fixed_noise * sigma2``. In this functional design the fixed per-point
noise lives in the WISKI caches and sigma2 lives in the params
(``raw_second_noise``); this module only provides the composition and the
diagonal NLL used for evaluation (reference ``utils/regression.py:5-17``).
"""

from __future__ import annotations

import jax.numpy as jnp

LOG_2PI = 1.8378770664093453


def fnmg_noise(fixed_noise: jnp.ndarray, second_noise: jnp.ndarray | None) -> jnp.ndarray:
    """noise = fixed * sigma2 (multiplicative second noise)."""
    if second_noise is None:
        return fixed_noise
    return fixed_noise * second_noise


def gaussian_nll(mean: jnp.ndarray, var: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean diagonal-Gaussian negative log-likelihood (per element)."""
    var = jnp.maximum(var, 1e-12)
    return 0.5 * (jnp.log(var) + (y - mean) ** 2 / var + LOG_2PI)
