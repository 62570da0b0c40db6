"""Dense exact GP — baseline model and parity-test oracle.

Plays both reference roles:
- the O(n^3) online-exact baselines (botorch ``SingleTaskGP`` /
  ``FixedNoiseGP`` inside ``online_exact_regression.py`` /
  ``online_exact_classifier.py``), and
- the from-scratch exact oracle the reference parity tests compare WISKI
  against (``tests/mlls/test_batched_woodbury_marginal_log_likelihood.py:37-73``).

``ski_kernel_matrix`` evaluates the *SKI-approximated* kernel
W_x1 K_uu W_x2^T so the oracle matches WISKI's model class exactly —
the same trick the reference test uses by deep-copying the SKI covar
module into a ``SingleTaskGP``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.kernels.grid_kernel import grid_kuu_dense
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.interp import interp_coeffs, dense_w
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, chol_logdet, tri_solve
from online_gp_tpu.ops.precision import f32_matmuls

LOG_2PI = 1.8378770664093453


def ski_kernel_matrix(
    kernel: Kernel,
    params: Dict,
    grid: Grid,
    x1: jnp.ndarray,
    x2: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """W_x1 K_uu W_x2^T — the effective WISKI prior covariance."""
    m = grid.num_points
    Kuu = grid_kuu_dense(kernel, params, grid)  # (..., m, m)
    i1, w1 = interp_coeffs(grid, x1)
    W1 = dense_w(i1, w1, m).T  # (n1, m)
    if x2 is None:
        W2 = W1
    else:
        i2, w2 = interp_coeffs(grid, x2)
        W2 = dense_w(i2, w2, m).T
    return W1 @ Kuu @ W2.swapaxes(-1, -2)


@f32_matmuls
def exact_mll(
    K: jnp.ndarray,
    y: jnp.ndarray,
    noise_diag: jnp.ndarray,
    jitter: float = 0.0,
) -> jnp.ndarray:
    """Standard dense GP MLL (zero mean), normalized by n.

    Args:
      K: (..., n, n) prior covariance; y: (..., n); noise_diag: (..., n).
    Returns (...,) mll / n.
    """
    n = K.shape[-1]
    Khat = K + jnp.einsum("...i,ij->...ij", noise_diag, jnp.eye(n, dtype=K.dtype))
    if jitter:
        Khat = Khat + jitter * jnp.eye(n, dtype=K.dtype)
    L = jnp.linalg.cholesky(Khat)
    alpha = tri_solve(L, y[..., None])
    quad = jnp.sum(alpha * alpha, axis=(-2, -1))
    logdet = chol_logdet(L)
    return -0.5 * (quad + logdet + n * LOG_2PI) / n


@f32_matmuls
def exact_posterior(
    K_train: jnp.ndarray,
    K_cross: jnp.ndarray,
    K_test_diag: jnp.ndarray,
    y: jnp.ndarray,
    noise_diag: jnp.ndarray,
    jitter: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense posterior f-moments.

    Args:
      K_train: (..., n, n); K_cross: (..., t, n); K_test_diag: (..., t);
      y: (..., n); noise_diag: (..., n).
    Returns mean (..., t), var (..., t).
    """
    n = K_train.shape[-1]
    Khat = K_train + jnp.einsum("...i,ij->...ij", noise_diag, jnp.eye(n, dtype=K_train.dtype))
    L = psd_safe_cholesky(Khat, jitter=jitter)
    alpha = cho_solve(L, y[..., None])  # (..., n, 1)
    mean = (K_cross @ alpha)[..., 0]
    v = tri_solve(L, K_cross.swapaxes(-1, -2))  # (..., n, t)
    var = K_test_diag - jnp.sum(v * v, axis=-2)
    return mean, jnp.maximum(var, 1e-12)
