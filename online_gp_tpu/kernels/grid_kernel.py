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


def _num_components(kernel: Kernel) -> int:
    """Mixture kernels (e.g. spectral mixture) are sums of separable
    components; K_uu is then a sum of Kronecker chains."""
    return int(getattr(kernel, "num_components", 1))


def grid_kuu_factors(kernel: Kernel, params: Params, grid: Grid, component: int | None = None) -> List[jnp.ndarray]:
    """Per-dimension dense grid factors; output scale/weight folded into
    dim 0. ``component`` selects a mixture component for mixture kernels."""
    factors = []
    for d in range(grid.ndim):
        g = grid.points_1d(d)
        if component is None:
            factors.append(kernel.factor_1d(params, d, g, include_scale=(d == 0)))
        else:
            factors.append(
                kernel.component_factor_1d(params, component, d, g, include_weight=(d == 0))
            )
    return factors


def grid_kuu_dense(kernel: Kernel, params: Params, grid: Grid) -> jnp.ndarray:
    """Dense (..., m, m) inducing kernel matrix."""
    nc = _num_components(kernel)
    if nc == 1:
        return kron_dense(grid_kuu_factors(kernel, params, grid))
    out = kron_dense(grid_kuu_factors(kernel, params, grid, component=0))
    for q in range(1, nc):
        out = out + kron_dense(grid_kuu_factors(kernel, params, grid, component=q))
    return out


def grid_kuu_mvm(kernel: Kernel, params: Params, grid: Grid, x: jnp.ndarray, use_toeplitz: bool = True) -> jnp.ndarray:
    """K_uu @ x without materializing K_uu.

    Args:
      x: (m, k) grid-space right-hand sides (unbatched params only).
    """
    nc = _num_components(kernel)
    if nc > 1:
        out = _component_mvm(kernel, params, grid, x, use_toeplitz, 0)
        for q in range(1, nc):
            out = out + _component_mvm(kernel, params, grid, x, use_toeplitz, q)
        return out
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


def _component_mvm(kernel, params, grid, x, use_toeplitz, q):
    if use_toeplitz:
        sizes = grid.sizes
        t = x.reshape(*sizes, x.shape[-1])
        for d in range(grid.ndim):
            col = kernel.component_factor_col(params, q, d, grid.points_1d(d), include_weight=(d == 0))
            t = jnp.moveaxis(t, d, -2)
            t = toeplitz_mvm(col, t)
            t = jnp.moveaxis(t, -2, d)
        return t.reshape(-1, x.shape[-1])
    return kron_mvm(grid_kuu_factors(kernel, params, grid, component=q), x)
