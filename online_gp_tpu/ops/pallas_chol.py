"""Blocked Cholesky as a single fused Pallas kernel.

Target: the m=900 ``chol(Q)`` inside the Woodbury MLL forward
(``models/wiski.py::_dense_inner_pieces``) — 290 us of the 681 us
per-point hyper-step at m=900 under XLA's factorization (0.84 TFLOP/s;
DESIGN.md §3 roofline). The reference hits the same factorization through
gpytorch's ``psd_safe_cholesky`` on its dense root caches
(``online_gp/mlls/batched_woodbury_marginal_log_likelihood.py:27-30``).

Design (right-looking, block size ``b``, everything VMEM-resident):

  for k in 0..nb-1 (unrolled at trace time -> every slice is static):
    1. panel loop (the only sequential math): b steps of masked rank-1
       elimination factor A_kk = Lkk Lkk^T, fused with the forward
       substitution that builds V = Lkk^{-1} — no separate triangular
       solve pass. All (b, b) VPU ops; no dynamic indexing (masked
       broadcasted-iota row/col extraction).
    2. panel solve: L[k+1:, k] = A[k+1:, k] @ V^T       (one MXU matmul)
    3. trailing syrk: A[k+1:, k+1:] -= P @ P^T          (one MXU matmul)

  Total MXU work is the exact m^3/3 (static slices, no masking waste);
  the sequential panel work is m masked-VPU steps regardless of b.

The input is padded to a multiple of b with an identity diagonal (the
factor of a block-diagonal extension is block-diagonal, so the top-left
m x m of the padded factor IS chol(Q)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _panel_factor_body(b, dtype):
    """b masked elimination steps on a (b, b) VMEM tile, fused with
    forward substitution for the panel inverse.

    carry: (A, L, V) all (b, b); returns factored L and V = L^{-1}.
    """
    # all index tensors kept >=2-D (TPU rejects 1-D iota)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)  # column vector
    colv = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)  # row vector
    one = jnp.ones((), dtype)

    def step(j, carry):
        A, L, V = carry
        col_is_j = cols == j
        row_is_j = rows == j
        # a_jj and column j of the partially-eliminated A
        a_jj = jnp.sum(jnp.where(col_is_j & row_is_j, A, 0.0))
        inv_sqrt = jax.lax.rsqrt(jnp.maximum(a_jj, 1e-30))
        col_j = jnp.sum(jnp.where(col_is_j, A, 0.0), axis=1, keepdims=True)  # (b,1)
        l_col = jnp.where(rowv >= j, col_j * inv_sqrt, 0.0)  # (b,1)
        # write L[:, j] = l_col
        L = L + l_col * jnp.where(colv == j, one, 0.0)
        # trailing rank-1 elimination (over-updating the j-th row/col is
        # harmless: they are never read again)
        A = A - l_col * l_col.reshape(1, b)
        # forward substitution row: V[j, :] = (e_j - L[j, :j] @ V) / l_jj
        lrow_j = jnp.sum(jnp.where(row_is_j, L, 0.0), axis=0, keepdims=True)  # (1,b)
        lrow_below = jnp.where(colv < j, lrow_j, 0.0)
        e_j = jnp.where(colv == j, one, 0.0)  # (1,b)
        v_row = (e_j - jnp.dot(lrow_below, V, preferred_element_type=jnp.float32)
                 .astype(dtype)) * inv_sqrt
        V = V + jnp.where(rowv == j, one, 0.0) * v_row
        return (A, L, V)

    return step


def _chol_kernel(q_ref, out_ref, *, b: int, nb: int):
    dtype = out_ref.dtype
    m_pad = nb * b
    # work in-place on the output tile
    out_ref[:] = q_ref[:]
    step = _panel_factor_body(b, dtype)

    for k in range(nb):  # unrolled: every slice below is static
        lo, hi = k * b, (k + 1) * b
        Akk = out_ref[lo:hi, lo:hi]
        zero = jnp.zeros((b, b), dtype)
        A, L, V = jax.lax.fori_loop(0, b, step, (Akk, zero, zero))
        out_ref[lo:hi, lo:hi] = L
        if k + 1 < nb:
            # panel solve + trailing syrk, exact-size static matmuls
            below = out_ref[hi:m_pad, lo:hi]
            P = jnp.dot(below, V.T, preferred_element_type=jnp.float32).astype(dtype)
            out_ref[hi:m_pad, lo:hi] = P
            out_ref[hi:m_pad, hi:m_pad] = out_ref[hi:m_pad, hi:m_pad] - jnp.dot(
                P, P.T, preferred_element_type=jnp.float32
            ).astype(dtype)
    # zero the strict upper triangle (jnp.linalg.cholesky contract)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (m_pad, m_pad), 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def blocked_cholesky(q: jnp.ndarray, block: int = 128, interpret: bool = False):
    """Lower Cholesky factor of PSD ``q`` ((..., m, m), f32) via the fused
    Pallas kernel. Batch dims are vmapped. Pads m up to a multiple of
    ``block`` with an identity diagonal and slices back.
    """
    if q.ndim > 2:
        return jax.vmap(lambda x: blocked_cholesky(x, block, interpret))(q)
    m = q.shape[-1]
    b = block
    nb = -(-m // b)
    m_pad = nb * b
    if m_pad != m:
        pad = jnp.eye(m_pad, dtype=q.dtype) * 1.0
        pad = pad.at[:m, :m].set(q)
        q = pad

    out = pl.pallas_call(
        functools.partial(_chol_kernel, b=b, nb=nb),
        out_shape=jax.ShapeDtypeStruct((m_pad, m_pad), q.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q)
    return out[:m, :m]
