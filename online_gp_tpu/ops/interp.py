"""SKI cubic-convolution interpolation (gather/scatter W ops).

The reference extracts its sparse interpolation matrix W from gpytorch's
``GridInterpolationKernel`` (reference
``online_gp/models/batched_fixed_noise_online_gp.py:22-28``) and applies it
with ``left_interp`` (ibid. lines 205-239). The interpolation rule is Keys
cubic convolution (a = -1/2): a 4-point stencil per input dimension, so a
D-dimensional query touches 4^D grid points.

TPU-first design: W is never stored as a sparse format. Each query point is
represented by static-shape ``(P,) = (4^D,)`` flat grid indices + weights,
and W's action is either

- a gather + weighted sum (``interp_matvec`` == gpytorch's ``left_interp``),
- a scatter-add into dense grid vectors (``dense_w``), or
- dense (n, m) blocks multiplied on the MXU for bulk prediction
  (``gather_predict`` builds means/variances in one fused matmul pair).

All shapes are static, so the whole thing jits and scans.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.ops.grid import Grid


def _keys_cubic(u: jnp.ndarray) -> jnp.ndarray:
    """Keys cubic-convolution kernel with a = -1/2 (Catmull-Rom).

    W(u) = 1.5|u|^3 - 2.5|u|^2 + 1          for |u| <= 1
         = -0.5|u|^3 + 2.5|u|^2 - 4|u| + 2  for 1 < |u| <= 2
         = 0                                 otherwise
    """
    a = jnp.abs(u)
    near = ((1.5 * a - 2.5) * a) * a + 1.0
    far = ((-0.5 * a + 2.5) * a - 4.0) * a + 2.0
    w = jnp.where(a <= 1.0, near, jnp.where(a <= 2.0, far, 0.0))
    return w


def interp_coeffs(grid: Grid, x: jnp.ndarray, detach: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cubic interpolation indices/weights for query points.

    Args:
      grid: the inducing grid.
      x: (n, D) query points.
      detach: stop gradients through the weights (the reference's
        ``detach_interp_coeff`` flag, ``online_gp/settings.py``).

    Returns:
      idx: (n, P) int32 flat grid indices, P = 4^D.
      w:   (n, P) interpolation weights (rows sum to 1 inside the bounds).
    """
    n = x.shape[0]
    ndim = grid.ndim
    strides = grid.strides

    flat_idx = jnp.zeros((n, 1), dtype=jnp.int32)
    flat_w = jnp.ones((n, 1), dtype=x.dtype)
    offsets = jnp.arange(4, dtype=jnp.int32)  # stencil offsets relative to i-1

    for d in range(ndim):
        m = grid.sizes[d]
        u = (x[:, d] - grid.mins[d]) / grid.spacings[d]  # grid coords
        i = jnp.floor(u).astype(jnp.int32)
        # clamp so the 4-point stencil {i-1, i, i+1, i+2} stays in range
        i = jnp.clip(i, 1, m - 3)
        t = u - i.astype(u.dtype)  # signed offset from left-center node
        # nodes at relative positions -1, 0, 1, 2 -> distances t+1, t, t-1, t-2
        dist = t[:, None] - jnp.array([-1.0, 0.0, 1.0, 2.0], dtype=u.dtype)[None, :]
        wd = _keys_cubic(dist)  # (n, 4)
        idx_d = (i[:, None] - 1) + offsets[None, :]  # (n, 4)

        flat_idx = (flat_idx[:, :, None] + idx_d[:, None, :] * strides[d]).reshape(n, -1)
        flat_w = (flat_w[:, :, None] * wd[:, None, :]).reshape(n, -1)

    if detach:
        flat_w = jax.lax.stop_gradient(flat_w)
        flat_idx = jax.lax.stop_gradient(flat_idx)
    return flat_idx, flat_w


def interp_matvec(idx: jnp.ndarray, w: jnp.ndarray, cache: jnp.ndarray) -> jnp.ndarray:
    """W_x @ cache — gpytorch's ``left_interp`` (reference usage at
    ``batched_fixed_noise_online_gp.py:206-210``).

    Args:
      idx: (n, P) flat grid indices.
      w: (n, P) weights.
      cache: (..., m, k) dense grid-space matrix.

    Returns:
      (..., n, k).
    """
    gathered = jnp.take(cache, idx, axis=-2)  # (..., n, P, k)
    return jnp.einsum("np,...npk->...nk", w, gathered)


def _densify_rows(idx: jnp.ndarray, w: jnp.ndarray, num_grid: int) -> jnp.ndarray:
    """(n, P) stencil -> dense (n, m) rows via compare-reduce (sums
    duplicate indices, like scatter-add)."""
    return jnp.sum(
        (idx[:, :, None] == jnp.arange(num_grid)[None, None, :]).astype(w.dtype)
        * w[:, :, None],
        axis=1,
    )


def dense_w(idx: jnp.ndarray, w: jnp.ndarray, num_grid: int) -> jnp.ndarray:
    """Densify W^T for a batch of points: returns (m, n) columns.

    This is the transposed-W orientation the reference's caches use
    (``_get_wmat_from_kernel`` returns the (m, n) sparse-transpose,
    ``batched_fixed_noise_online_gp.py:22-28``). Duplicate stencil indices
    (possible after edge clamping) are summed, like scatter-add. On TPU
    the densification is a vectorized compare-reduce — XLA lowers
    scatter-add to a serialized loop there.
    """
    n, P = idx.shape
    if jax.default_backend() == "tpu":
        return _densify_rows(idx, w, num_grid).T
    cols = jnp.zeros((num_grid, n), dtype=w.dtype)
    point_ids = jnp.broadcast_to(jnp.arange(n)[:, None], (n, P))
    return cols.at[idx.reshape(-1), point_ids.reshape(-1)].add(w.reshape(-1))


def wt_matvec(idx: jnp.ndarray, w: jnp.ndarray, v: jnp.ndarray, num_grid: int) -> jnp.ndarray:
    """W^T applied to point-space vectors: (n, k) -> (m, k).

    Scatter-add off-TPU; on TPU, chunked dense-row matmuls (compare-reduce
    + MXU) — XLA scatter serializes per element there."""
    n, P = idx.shape
    if jax.default_backend() == "tpu":
        out = jnp.zeros((num_grid, v.shape[-1]), dtype=v.dtype)
        chunk = 2048
        with jax.default_matmul_precision("float32"):
            for s in range(0, n, chunk):
                rows = _densify_rows(idx[s : s + chunk], w[s : s + chunk], num_grid)
                out = out + rows.T @ v[s : s + chunk]
        return out
    contrib = w[:, :, None] * v[:, None, :]  # (n, P, k)
    out = jnp.zeros((num_grid, v.shape[-1]), dtype=v.dtype)
    return out.at[idx.reshape(-1)].add(contrib.reshape(n * P, v.shape[-1]))


def gather_predict(
    idx: jnp.ndarray,
    w: jnp.ndarray,
    mean_cache: jnp.ndarray,
    cov_cache: jnp.ndarray | None,
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """Fused posterior gather: mean = W_x mu, var = diag(W_x C W_x^T).

    Args:
      idx, w: (n, P) interpolation coefficients.
      mean_cache: (..., m, 1) grid-space predictive mean cache.
      cov_cache: (..., m, m) grid-space predictive covariance cache or None.

    Returns:
      mean (..., n), var (..., n) or None.

    The variance uses a P×P gather (C[idx_i, idx_j]) instead of forming the
    dense (n, m) W block — O(n P^2) memory traffic instead of O(n m).
    """
    mean = interp_matvec(idx, w, mean_cache)[..., 0]  # (..., n)
    if cov_cache is None:
        return mean, None
    # one combined gather produces the (n, P, P) submatrices directly —
    # never materializing the (n, P, m) row block
    sub = cov_cache[..., idx[:, :, None], idx[:, None, :]]  # (..., n, P, P)
    var = jnp.einsum("np,...npq,nq->...n", w, sub, w)
    return mean, var


def interp_root_matvec(idx: jnp.ndarray, w: jnp.ndarray, root_cache: jnp.ndarray) -> jnp.ndarray:
    """W_x @ R for a covariance root R — the fast_pred_samples path
    (``batched_fixed_noise_online_gp.py:229-243``). Returns (..., n, k)."""
    return interp_matvec(idx, w, root_cache)
