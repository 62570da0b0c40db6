"""Evaluation metrics.

Mirrors the reference's batched RMSE/NLL evaluation
(``online_gp/utils/regression.py:5-17``): predictions in chunks of 1024,
RMSE computed per chunk and averaged across chunks (the reference's exact
averaging, kept for metric parity), NLL as the mean diagonal-Gaussian
negative log-prob.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.likelihoods.gaussian import gaussian_nll


@jax.jit
def _rmse_nll_chunk(mean, var, y):
    # fused into one dispatch: eager per-op execution costs ~25 ms/op on
    # the tunneled chip, which made per-step evaluation dispatch-bound
    rmse = jnp.sqrt(jnp.mean((mean - y) ** 2))
    nll = jnp.mean(gaussian_nll(mean, var, y))
    return rmse, nll


def batched_rmse_nll(
    predict_fn: Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]],
    inputs: jnp.ndarray,
    targets: jnp.ndarray,
    batch_size: int = 1024,
) -> Tuple[float, float]:
    """predict_fn(x) -> (mean, var) with shapes (b, T)."""
    n = inputs.shape[0]
    num_batches = max(1, -(-n // batch_size))
    rmse = nll = 0.0
    for start in range(0, n, batch_size):
        xb = inputs[start : start + batch_size]
        yb = targets[start : start + batch_size]
        mean, var = predict_fn(xb)
        r, l = _rmse_nll_chunk(mean, var, yb)
        rmse += float(r) / num_batches
        nll += float(l) / num_batches
    return rmse, nll


def accuracy(pred_labels: jnp.ndarray, labels: jnp.ndarray) -> float:
    return float(jnp.mean((pred_labels == labels).astype(jnp.float32)))
