"""PSD-safe Cholesky with jitter escalation.

Rebuilds gpytorch's ``psd_safe_cholesky`` semantics (used throughout the
reference, e.g. ``online_gp/models/streaming_sgpr.py:79,126,138`` and
``variational_gp_model.py:199``): try a Cholesky, and if it produces NaNs,
retry with a 10x larger diagonal jitter, a fixed number of times.

JAX-correct version: a ``lax.while_loop`` of gradient-free probes finds the
first finite jitter level, then one differentiable factorization runs at
that level — no data-dependent Python control flow, so the op stays
jittable and batchable, and gradients never flow through a failed (NaN)
factorization.
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

    # Pick the jitter level with gradient-free probes, then run ONE
    # differentiable factorization at the chosen level. Selecting among
    # the attempts with jnp.where instead is a NaN-gradient trap: the
    # VJP of a FAILED (NaN-valued) cholesky is NaN even under a zero
    # cotangent (0 * nan), so whenever level 0 fails — routine for f32
    # kernel Grams on TPU, whose blocked factorization gives up earlier
    # than CPU LAPACK — every hyperparameter gradient through the solve
    # chain is poisoned (observed as the first SVGP hyper step NaNing
    # lengthscale/outputscale/z on-chip while CPU was healthy).
    # The probe loop runs as a lax.while_loop so the common case (level 0
    # succeeds everywhere) costs ONE probe factorization + one
    # differentiable factorization, instead of materializing all `tries`
    # attempts in the trace (the pre-round-4 jnp.where chain always paid
    # for every level — and psd_safe_cholesky sits on the per-point
    # full-update hot path at m=900).
    with _highest():
        probe_mat = jax.lax.stop_gradient(mat)

        def probe_ok(level):
            shift = (jitter * (10.0 ** level) * diag_scale)[..., None, None] * eye
            return jnp.isfinite(jnp.linalg.cholesky(probe_mat + shift)).all(
                axis=(-2, -1)
            )

        def cond(state):
            level, _, done = state
            return (level < tries) & ~done.all()

        def body(state):
            level, chosen, done = state
            ok = probe_ok(level.astype(mat.dtype))
            chosen = jnp.where(ok & ~done, level.astype(mat.dtype), chosen)
            return level + 1, chosen, done | ok

        init = (
            jnp.asarray(0, jnp.int32),
            jnp.full(diag_scale.shape, float(tries - 1), mat.dtype),
            jnp.zeros(diag_scale.shape, bool),
        )
        _, chosen, _ = jax.lax.while_loop(cond, body, init)
        eps = jitter * (10.0 ** chosen) * diag_scale
        return jnp.linalg.cholesky(mat + eps[..., None, None] * eye)


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
