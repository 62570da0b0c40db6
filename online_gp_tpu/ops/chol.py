"""PSD-safe Cholesky with jitter escalation.

Rebuilds gpytorch's ``psd_safe_cholesky`` semantics (used throughout the
reference, e.g. ``online_gp/models/streaming_sgpr.py:79,126,138`` and
``variational_gp_model.py:199``): try a Cholesky, and if it produces NaNs,
retry with a 10x larger diagonal jitter, a fixed number of times.

JAX-correct version: all ``tries`` factorizations are expressed in one
trace with ``lax.select`` picking the first finite one — no data-dependent
Python control flow, so the op stays jittable and batchable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

# TPU matmuls default to bf16-accumulated passes; factorizations and
# triangular solves need true float32 accumulation or ill-conditioned
# systems (e.g. SKI Gram matrices with unsupported grid points) produce
# garbage/NaN. Pin the precision inside every op in this module.
def _highest():
    return jax.default_matmul_precision("float32")


def psd_safe_cholesky(
    mat: jnp.ndarray,
    jitter: float = 1e-6,
    tries: int = 3,
) -> jnp.ndarray:
    """Lower Cholesky of a PSD matrix with escalating diagonal jitter.

    Args:
      mat: (..., n, n) symmetric PSD.
      jitter: initial jitter scale (scaled by mean diagonal magnitude).
      tries: number of 10x escalations to fold into the trace.

    Returns:
      (..., n, n) lower-triangular factor; the first numerically successful
      jitter level wins.
    """
    n = mat.shape[-1]
    eye = jnp.eye(n, dtype=mat.dtype)
    diag_scale = jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(mat, axis1=-2, axis2=-1)), axis=-1), 1.0)

    def attempt(level: int) -> jnp.ndarray:
        eps = jitter * (10.0 ** level)
        shift = (eps * diag_scale)[..., None, None] * eye
        return jnp.linalg.cholesky(mat + shift)

    with _highest():
        chol = attempt(0)
        for level in range(1, tries):
            ok = jnp.isfinite(chol).all(axis=(-2, -1), keepdims=True)
            chol = jnp.where(ok, chol, attempt(level))
        return chol


def tri_solve(chol: jnp.ndarray, rhs: jnp.ndarray, trans: bool = False) -> jnp.ndarray:
    """Triangular solve L x = rhs (or L^T x = rhs when trans)."""
    with _highest():
        return solve_triangular(chol, rhs, lower=True, trans=1 if trans else 0)


def cho_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve (L L^T) x = rhs given the lower factor."""
    return tri_solve(chol, tri_solve(chol, rhs), trans=True)


def chol_logdet(chol: jnp.ndarray) -> jnp.ndarray:
    """log|A| from its lower Cholesky factor: 2 * sum(log diag L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def chol_inverse(chol: jnp.ndarray) -> jnp.ndarray:
    """Dense inverse from the lower factor (L L^T)^{-1}."""
    n = chol.shape[-1]
    eye = jnp.eye(n, dtype=chol.dtype)
    return cho_solve(chol, jnp.broadcast_to(eye, chol.shape))


def inv_lower_transpose(chol: jnp.ndarray) -> jnp.ndarray:
    """L^{-T} — the inverse-root B with (L L^T)^{-1} = B B^T."""
    n = chol.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=chol.dtype), chol.shape)
    with _highest():
        return solve_triangular(chol, eye, lower=True, trans=1)
