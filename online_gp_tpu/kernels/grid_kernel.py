"""Inducing-grid kernel assembly: K_uu as dense / Kronecker×Toeplitz.

The reference reads K_uu straight off gpytorch's grid kernel
(``covar_module._inducing_forward``,
``batched_fixed_noise_online_gp.py:336-341``). Here:

- ``grid_kuu_dense``: materialize (..., m, m) from per-dim factors via the
  Kronecker chain — used whenever m <= SolverConfig.max_cholesky_size.
- ``grid_kuu_factors``: the per-dim (..., m_d, m_d) dense factors.
- ``grid_kuu_mvm``: structured MVM (Kronecker of Toeplitz-FFT per-dim
  products) for large grids — the ``use_toeplitz`` path.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from online_gp_tpu.kernels.base import Kernel, Params
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.kron import kron_dense, kron_mvm
from online_gp_tpu.ops.toeplitz import toeplitz_mvm


def grid_kuu_factors(kernel: Kernel, params: Params, grid: Grid) -> List[jnp.ndarray]:
    """Per-dimension dense grid factors; output scale folded into dim 0."""
    factors = []
    for d in range(grid.ndim):
        g = grid.points_1d(d)
        factors.append(kernel.factor_1d(params, d, g, include_scale=(d == 0)))
    return factors


def grid_kuu_dense(kernel: Kernel, params: Params, grid: Grid) -> jnp.ndarray:
    """Dense (..., m, m) inducing kernel matrix."""
    return kron_dense(grid_kuu_factors(kernel, params, grid))


def grid_kuu_mvm(kernel: Kernel, params: Params, grid: Grid, x: jnp.ndarray, use_toeplitz: bool = True) -> jnp.ndarray:
    """K_uu @ x without materializing K_uu.

    Args:
      x: (m, k) grid-space right-hand sides (unbatched params only).
    """
    if use_toeplitz:
        sizes = grid.sizes
        t = x.reshape(*sizes, x.shape[-1])
        for d in range(grid.ndim):
            col = kernel.factor_col(params, d, grid.points_1d(d), include_scale=(d == 0))
            t = jnp.moveaxis(t, d, -2)
            t = toeplitz_mvm(col, t)
            t = jnp.moveaxis(t, -2, d)
        return t.reshape(-1, x.shape[-1])
    factors = grid_kuu_factors(kernel, params, grid)
    return kron_mvm(factors, x)
