"""Batched conjugate gradients + stochastic Lanczos quadrature logdet.

The reference reaches these through gpytorch's ``inv_matmul`` /
``inv_quad_logdet`` machinery with ``cg_tolerance`` / iteration caps set
globally (``config/regression.yaml:24-27``; usage e.g.
``mlls/batched_woodbury_marginal_log_likelihood.py:27-30``). TPU-native
version: a *fixed-iteration* CG (static shapes; tolerance handled by
masking converged systems, not by dynamic exit) that jits, batches, and
differentiates; logdet estimated by SLQ over Lanczos tridiagonalizations
of Hutchinson probes. These power the big-grid (m > max_cholesky_size)
structured path where dense factorization is off the table.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def batched_cg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    rhs: jnp.ndarray,
    max_iters: int = 100,
    tol: float = 1e-2,
    precond: Callable[[jnp.ndarray], jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Solve A X = rhs for PSD A given only its MVM.

    Args:
      matvec: (..., m, k) -> (..., m, k) symmetric PSD product.
      rhs: (..., m, k) right-hand sides (k solved simultaneously).
      max_iters: static iteration count (the jit-shape budget).
      tol: relative residual at which a column freezes (masked, not exited).

    Returns (..., m, k) approximate solves.
    """
    M = precond if precond is not None else (lambda x: x)
    rhs_norm = jnp.sqrt(jnp.sum(rhs * rhs, axis=-2, keepdims=True))
    stop = tol * jnp.maximum(rhs_norm, 1e-30)

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = M(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0, axis=-2, keepdims=True)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap, axis=-2, keepdims=True)
        alpha = rz / jnp.maximum(denom, 1e-30)
        res = jnp.sqrt(jnp.sum(r * r, axis=-2, keepdims=True))
        active = (res > stop).astype(rhs.dtype)
        x = x + alpha * p * active
        r = r - alpha * Ap * active
        z = M(r)
        rz_new = jnp.sum(r * z, axis=-2, keepdims=True)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0), None, length=max_iters)
    return x


def lanczos(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    v0: jnp.ndarray,
    num_iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-k Lanczos tridiagonalization with full reorthogonalization.

    Args:
      matvec: (m,) -> (m,) PSD product.
      v0: (m,) start vector.
      num_iters: k (static).

    Returns:
      Q (k, m) orthonormal Lanczos vectors, alpha (k,), beta (k-1,).
    """
    m = v0.shape[0]
    k = num_iters
    q = v0 / jnp.linalg.norm(v0)
    Q = jnp.zeros((k, m), v0.dtype).at[0].set(q)
    alphas = jnp.zeros((k,), v0.dtype)
    betas = jnp.zeros((k,), v0.dtype)

    def body(i, carry):
        Q, alphas, betas = carry
        q = Q[i]
        w = matvec(q)
        a = jnp.dot(q, w)
        w = w - a * q - jnp.where(i > 0, betas[i - 1], 0.0) * Q[jnp.maximum(i - 1, 0)]
        # full reorthogonalization (mask future rows)
        mask = (jnp.arange(k) <= i).astype(v0.dtype)
        coeffs = (Q @ w) * mask
        w = w - Q.T @ coeffs
        b = jnp.linalg.norm(w)
        # breakdown guard: once the Krylov space is exhausted (k exceeds
        # the operator's rank — e.g. a rank-n A = W D^{-1} W^T asked for a
        # rank-k > n root), the residual is pure rounding noise; dividing
        # by it produces garbage vectors whose alphas explode into eigh
        # NaNs. Zero-truncate instead: the remaining Lanczos vectors, this
        # beta, and all later (alpha, beta) stay 0, so T's trailing block
        # contributes zero eigenvalues — a clean rank truncation.
        eps = jnp.finfo(v0.dtype).eps
        ok = b > 100.0 * eps * (jnp.abs(a) + jnp.where(i > 0, betas[i - 1], 0.0) + 1.0)
        b = jnp.where(ok, b, 0.0)
        q_next = jnp.where(ok, w / jnp.maximum(b, 1e-30), jnp.zeros_like(w))
        Q = jax.lax.cond(
            i + 1 < k, lambda Q: Q.at[i + 1].set(q_next), lambda Q: Q, Q
        )
        alphas = alphas.at[i].set(a)
        betas = betas.at[i].set(b)
        return (Q, alphas, betas)

    Q, alphas, betas = jax.lax.fori_loop(0, k, body, (Q, alphas, betas))
    return Q, alphas, betas[: k - 1]


def lanczos_root(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    v0: jnp.ndarray,
    num_iters: int,
) -> jnp.ndarray:
    """Rank-k approximate root R (m, k) with A ~= R R^T, via the Lanczos
    relation A ~= Q^T T Q and T = V L V^T (the gpytorch
    ``root_decomposition(method="lanczos")`` the reference's
    fast_pred_samples path uses, ``batched_fixed_noise_online_gp.py:231``)."""
    Q, alphas, betas = lanczos(matvec, v0, num_iters)
    T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 0.0)
    return Q.T @ (evecs * jnp.sqrt(evals)[None, :])


def slq_logdet(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    m: int,
    key,
    num_probes: int = 16,
    num_iters: int = 32,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Stochastic Lanczos quadrature estimate of log|A| for PSD A."""

    def one_probe(k):
        z = jax.random.rademacher(k, (m,), dtype=dtype)
        _, alphas, betas = lanczos(matvec, z, num_iters)
        T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
        evals, evecs = jnp.linalg.eigh(T)
        evals = jnp.maximum(evals, 1e-30)
        w = evecs[0, :] ** 2
        return jnp.sum(w * jnp.log(evals)) * m

    keys = jax.random.split(key, num_probes)
    return jnp.mean(jax.vmap(one_probe)(keys))
