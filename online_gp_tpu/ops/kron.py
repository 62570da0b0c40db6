"""Kronecker-product operators for grid kernels.

A stationary product kernel evaluated on a Cartesian grid factors as
K_uu = T_0 ⊗ T_1 ⊗ ... ⊗ T_{D-1} (one factor per dimension; the structure
gpytorch's grid kernels exploit and the reference inherits — SURVEY.md
§2.9). Row-major flattening (dim 0 slowest) matches
:class:`online_gp_tpu.ops.grid.Grid`.

The MVM is the standard reshape-matmul chain: contract each factor along
its own axis — D small dense matmuls instead of one m×m product.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def kron_dense(factors: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Dense T_0 ⊗ ... ⊗ T_{D-1}. Supports leading batch dims on factors."""
    out = factors[0]
    for f in factors[1:]:
        b = jnp.broadcast_shapes(out.shape[:-2], f.shape[:-2])
        m1, n1 = out.shape[-2:]
        m2, n2 = f.shape[-2:]
        prod = out[..., :, None, :, None] * f[..., None, :, None, :]
        out = prod.reshape(*b, m1 * m2, n1 * n2)
    return out


def kron_mvm(factors: Sequence[jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    """(⊗_d T_d) @ x for x of shape (..., m, k), m = prod of factor sizes."""
    sizes = [f.shape[-1] for f in factors]
    batch = x.shape[:-2]
    k = x.shape[-1]
    # reshape to (..., m_0, ..., m_{D-1}, k)
    t = x.reshape(*batch, *sizes, k)
    nb = len(batch)
    for d, f in enumerate(factors):
        # move axis d (offset by batch) to last-but-one and contract
        t = jnp.moveaxis(t, nb + d, -2)
        t = jnp.matmul(f, t)
        t = jnp.moveaxis(t, -2, nb + d)
    return t.reshape(*batch, -1, k)
