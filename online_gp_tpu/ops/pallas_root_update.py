"""Pallas TPU kernel: fused rank-1 maintained-root update.

The q=1 streaming-conditioning hot loop (see
:func:`online_gp_tpu.ops.root_update.root_cache_update`) is HBM-bandwidth
bound: per update it must read and rewrite the three m×m state matrices
(L, B, A). The XLA path materializes the intermediates p = B^T v,
LU = L u, BU = B u as separate HBM round-trips; this kernel fuses the
whole update into two passes:

  pass 1 (reduction):  p = B^T v, accumulated over row-tiles of B
  pass 2 (row-tiled):  given u = p/|p| and the scalar eigen-updates
                       c = sqrt(|p|^2+1)-1, d = 1/sqrt(|p|^2+1)-1:
     L_i <- L_i + c (L_i u) u^T
     B_i <- B_i + d (B_i u) u^T
     A_i <- A_i + v_i v^T

so L/B/A stream through VMEM exactly once each way. Off-TPU,
``pallas_root_cache_update`` falls back to the XLA path
(:func:`root_cache_update`); the kernel itself can be executed anywhere
with ``interpret=True`` — the correctness tests
(``tests/ops/test_pallas_root_update.py``) run it that way on CPU against
the XLA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from online_gp_tpu.ops.root_update import RootCache, root_cache_update


def _p_kernel(b_ref, v_ref, p_ref, *, m: int, tile: int):
    """Accumulate p += v_tile^T @ B_tile over sequential row-tile steps."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        p_ref[:] = jnp.zeros_like(p_ref)

    # VPU multiply+sum (exact f32 accumulation). The edge tile extends past
    # the array: rows >= m are undefined and MUST be masked out of the
    # reduction.
    rid = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile
    prod = jnp.where(rid < m, v_ref[:] * b_ref[:], 0.0)
    p_ref[:] += jnp.sum(prod, axis=0, keepdims=True)


def _update_kernel(p_ref, vfull_ref, l_ref, b_ref, a_ref, v_ref, lo_ref, bo_ref, ao_ref):
    p = p_ref[:]  # (1, m)
    s2 = jnp.sum(p * p)
    s = jnp.sqrt(s2)
    inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
    u = p * inv_s
    c = jnp.sqrt(s2 + 1.0) - 1.0
    d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0

    lu = jnp.sum(l_ref[:] * u, axis=1, keepdims=True)  # (TI, 1), f32 VPU
    bu = jnp.sum(b_ref[:] * u, axis=1, keepdims=True)
    lo_ref[:] = l_ref[:] + (c * lu) * u
    bo_ref[:] = b_ref[:] + (d * bu) * u
    # A_i += v_i v^T  (v_ref: (TI, 1) row chunk; vfull_ref: (1, m))
    ao_ref[:] = a_ref[:] + v_ref[:] * vfull_ref[:]


def _update_kernel_slim(p_ref, l_ref, b_ref, lo_ref, bo_ref):
    """Roots-only variant for slim caches (no Gram accumulator): 4 m^2
    floats of HBM traffic per update instead of 6."""
    p = p_ref[:]  # (1, m)
    s2 = jnp.sum(p * p)
    s = jnp.sqrt(s2)
    inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
    u = p * inv_s
    c = jnp.sqrt(s2 + 1.0) - 1.0
    d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0

    lu = jnp.sum(l_ref[:] * u, axis=1, keepdims=True)
    bu = jnp.sum(b_ref[:] * u, axis=1, keepdims=True)
    lo_ref[:] = l_ref[:] + (c * lu) * u
    bo_ref[:] = b_ref[:] + (d * bu) * u


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_update(L, B, A, v, tile: int = 128, interpret: bool = False):
    """Fused rank-1 update of (L, B, A) with vector v.

    Args:
      L, B, A: (m, m) float32; v: (m, 1) float32.
      interpret: run the kernel in Pallas interpret mode (any backend);
        used by the CPU parity tests.

    Returns (L', B', A').
    """
    m = L.shape[-1]
    grid = (pl.cdiv(m, tile),)

    p = pl.pallas_call(
        functools.partial(_p_kernel, m=m, tile=tile),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
    )(B, v)

    outs = pl.pallas_call(
        _update_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # v^T
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # L
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # B
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # A
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # v rows
        ],
        out_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
    )(p, v.T, L, B, A, v)
    return outs


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_apply(L, B, p, tile: int = 128, interpret: bool = False):
    """Apply the rank-1 root update given p = B^T v directly (one fused
    kernel, 4 m^2 floats of HBM traffic): returns (L', B').

    The caller computes p cheaply from the sparse SKI stencil (a 4^D-row
    gather of B, O(P m) traffic) instead of the dense m^2 reduction pass —
    see ``wiski_condition``'s q=1 hot path.
    """
    m = L.shape[-1]
    grid = (pl.cdiv(m, tile),)
    outs = pl.pallas_call(
        _update_kernel_slim,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # L
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # B
        ],
        out_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
    )(p.reshape(1, m), L, B)
    return outs


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_update_slim(L, B, v, tile: int = 128, interpret: bool = False):
    """Fused rank-1 update of the roots only (slim caches, no Gram
    accumulator): returns (L', B')."""
    m = L.shape[-1]
    grid = (pl.cdiv(m, tile),)

    p = pl.pallas_call(
        functools.partial(_p_kernel, m=m, tile=tile),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.float32),
    )(B, v)

    outs = pl.pallas_call(
        _update_kernel_slim,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # L
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # B
        ],
        out_specs=[
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
    )(p, L, B)
    return outs


def _update_kernel_slim_batched(p_ref, l_ref, b_ref, lo_ref, bo_ref):
    """Roots-only rank-1 update, one output batch per grid row: blocks
    carry a leading (1,) batch dim selected by program_id(0)."""
    p = p_ref[0]  # (1, m)
    s2 = jnp.sum(p * p)
    s = jnp.sqrt(s2)
    inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
    u = p * inv_s
    c = jnp.sqrt(s2 + 1.0) - 1.0
    d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0

    lu = jnp.sum(l_ref[0] * u, axis=1, keepdims=True)  # (TI, 1)
    bu = jnp.sum(b_ref[0] * u, axis=1, keepdims=True)
    lo_ref[:] = (l_ref[0] + (c * lu) * u)[None]
    bo_ref[:] = (b_ref[0] + (d * bu) * u)[None]


def _update_kernel_batched(
    p_ref, vfull_ref, l_ref, b_ref, a_ref, v_ref, lo_ref, bo_ref, ao_ref
):
    """Full (roots + Gram accumulator) rank-1 update with a leading output
    batch grid dimension."""
    p = p_ref[0]
    s2 = jnp.sum(p * p)
    s = jnp.sqrt(s2)
    inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
    u = p * inv_s
    c = jnp.sqrt(s2 + 1.0) - 1.0
    d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0

    lu = jnp.sum(l_ref[0] * u, axis=1, keepdims=True)
    bu = jnp.sum(b_ref[0] * u, axis=1, keepdims=True)
    lo_ref[:] = (l_ref[0] + (c * lu) * u)[None]
    bo_ref[:] = (b_ref[0] + (d * bu) * u)[None]
    ao_ref[:] = (a_ref[0] + v_ref[0] * vfull_ref[0])[None]


def _p_kernel_batched(b_ref, v_ref, p_ref, *, m: int, tile: int):
    """p[b] += v_tile[b]^T @ B_tile[b], accumulated over the (sequential)
    row-tile grid dim; batch dim is grid dim 0 (batch-major iteration, so
    the i==0 reset lands before each batch's accumulation)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        p_ref[:] = jnp.zeros_like(p_ref)

    rid = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + i * tile
    prod = jnp.where(rid < m, v_ref[0] * b_ref[0], 0.0)
    p_ref[:] += jnp.sum(prod, axis=0, keepdims=True)[None]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_apply_batched(L, B, p, tile: int = 128, interpret: bool = False):
    """Batched-over-outputs :func:`pallas_rank1_apply`: one pallas_call with
    grid (Bd, row-tiles) instead of a Python unroll per output — compile
    count and kernel count are independent of the class/output batch.

    Args:
      L, B: (Bd, m, m) float32; p: (Bd, m) float32 with p[b] = B[b]^T v[b].

    Returns (L', B') with leading Bd dim.
    """
    Bd, m = L.shape[0], L.shape[-1]
    grid = (Bd, pl.cdiv(m, tile))
    outs = pl.pallas_call(
        _update_kernel_slim_batched,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
        ],
    )(p.reshape(Bd, 1, m), L, B)
    return outs


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_update_batched(L, B, A, v, tile: int = 128, interpret: bool = False):
    """Batched-over-outputs :func:`pallas_rank1_update` (roots + Gram):
    L, B, A: (Bd, m, m); v: (Bd, m, 1). Returns (L', B', A')."""
    Bd, m = L.shape[0], L.shape[-1]
    grid = (Bd, pl.cdiv(m, tile))

    p = pl.pallas_call(
        functools.partial(_p_kernel_batched, m=m, tile=tile),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bd, 1, m), jnp.float32),
    )(B, v)

    outs = pl.pallas_call(
        _update_kernel_batched,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
        ],
    )(p, v.swapaxes(-1, -2), L, B, A, v)
    return outs


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_rank1_update_slim_batched(L, B, v, tile: int = 128, interpret: bool = False):
    """Batched-over-outputs :func:`pallas_rank1_update_slim`:
    L, B: (Bd, m, m); v: (Bd, m, 1). Returns (L', B')."""
    Bd, m = L.shape[0], L.shape[-1]
    grid = (Bd, pl.cdiv(m, tile))

    p = pl.pallas_call(
        functools.partial(_p_kernel_batched, m=m, tile=tile),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bd, 1, m), jnp.float32),
    )(B, v)

    outs = pl.pallas_call(
        _update_kernel_slim_batched,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
        ],
    )(p, L, B)
    return outs


def pallas_blocked_chunk(L, B, S, interpret: bool = False):
    """One fused chunk of the blocked sequential-stream root update.

    Computes, entirely on-chip, the k sequential rank-1 updates

        L <- L (I + c_t u_t u_t^T),  B <- B (I + d_t u_t u_t^T)

    for update vectors v_t = S[t] (rows of the sparse stencil matrix):
    the inverse root stays VMEM-resident so all k p0 = B^T v_t come from
    one MXU matmul, the factor recursion runs in VMEM scratch, and the two
    rank-k applications are tiled f32 MXU matmuls. Per chunk, HBM traffic
    is ~5 m^2 floats (B read twice, L read+write, B write) — ~5 m^2 / k
    per update instead of the 4 m^2 of the per-point kernel.

    Delegates to the batched kernel at Bd=1 (identical math and measured
    VMEM behavior — one kernel to maintain instead of two). Admissible
    (m, k) are bounded by the 16 MB scoped-VMEM compile limit; see
    :func:`online_gp_tpu.ops.root_update.fused_chunk_fits_vmem` for the
    measured envelope the auto dispatch uses.

    Args:
      L, B: (m, m) float32 root / inverse root.
      S: (k, m) float32 — row t is the (sparse, scatter-built) update
        vector: stencil weights / sqrt(noise) at the stencil indices.

    Returns (L', B').
    """
    Lb, Bb = pallas_blocked_chunk_batched(
        L[None], B[None], S[None], interpret=interpret
    )
    return Lb[0], Bb[0]


def _fused_chunk_kernel_batched(
    s_in, l_in, b_full, b_tile, l_out, b_out, p0_scr, u_scr, p_scr, r_scr,
    *, k: int, sub: int,
):
    """Fused rank-k blocked chunk (stencil matmul + factor recursion +
    MXU apply) with an output-batch grid dimension: grid dim 0 selects
    the output batch, dim 1 the row tile. Blocks carry a leading (1,) batch
    dim; the k-step factor recursion re-runs in scratch at each batch's
    first tile (batch-major grid order guarantees tiles of batch b see
    batch b's factors). At each batch's first tile, one MXU matmul against
    the VMEM-resident inverse root computes all k p0 rows (P0 = S @ B, S
    the sparse stencil matrix) and the factor recursion fills the (k, m)
    scratch factors; every tile then applies

        L_tile += (L_tile @ R^T) @ U,   B_tile += (B_tile @ P^T) @ U

    with f32 MXU matmuls. Scratch persists across the sequential grid.

    TWO-LEVEL recursion (``sub < k``): the sequential per-step cost of the
    flat recursion is O(k m) VPU reductions over the full scratch even
    though only t rows are populated at step t — ~65% of the chunk's
    runtime at k=128, m=900. Splitting k into k/sub sub-blocks makes it
    O(sub m): the elementary-factor product telescopes as

        F_k..F_1 = G_nb .. G_1,     G_j = I + sum_{t in j} u_t p_col_t^T

    where each G_j comes from the FLAT recursion run locally on rows
    pre-corrected by the previous sub-blocks' operators (q = G_{j-1}..G_1
    p0, two MXU matmuls per (j, i<j) pair), and the L/B applications
    multiply the G_j in stream order per tile. Exact same real-number
    algebra as the flat recursion — fp reassociation only. ``sub == k``
    IS the flat recursion (no correction passes, one local loop)."""
    i = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST
    nb = k // sub
    assert nb * sub == k

    @pl.when(i == 0)
    def _():
        u_scr[:] = jnp.zeros_like(u_scr)
        p_scr[:] = jnp.zeros_like(p_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        p0_scr[:] = jnp.dot(s_in[0], b_full[0], precision=hi)

        for j in range(nb):  # static unroll (nb is small: k/sub)
            lo = j * sub
            # correct this sub-block's raw rows by the previous
            # sub-blocks' operators: q <- (I + U_i^T P_i) applied in
            # stream order (row-vector form: q += (q P_i^T) U_i)
            if j:
                rows = p0_scr[pl.ds(lo, sub), :]  # (sub, m)
                for i2 in range(j):
                    lo2 = i2 * sub
                    pi = p_scr[pl.ds(lo2, sub), :]
                    ui = u_scr[pl.ds(lo2, sub), :]
                    a2 = jax.lax.dot_general(
                        rows, pi, (((1,), (1,)), ((), ())), precision=hi
                    )  # (sub, sub)
                    rows = rows + jnp.dot(a2, ui, precision=hi)
                p0_scr[pl.ds(lo, sub), :] = rows

            def body(t, _, lo=lo):
                tt = lo + t
                uloc = u_scr[pl.ds(lo, sub), :]
                ploc = p_scr[pl.ds(lo, sub), :]
                rloc = r_scr[pl.ds(lo, sub), :]
                q = p0_scr[pl.ds(tt, 1), :]
                a = jnp.sum(ploc * q, axis=1, keepdims=True)
                p = q + jnp.sum(uloc * a, axis=0, keepdims=True)
                s2 = jnp.sum(p * p)
                s = jnp.sqrt(s2)
                inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
                u = p * inv_s
                c = jnp.sqrt(s2 + 1.0) - 1.0
                d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0
                g = jnp.sum(uloc * u, axis=1, keepdims=True)
                p_col = d * (u + jnp.sum(ploc * g, axis=0, keepdims=True))
                r_col = c * (u + jnp.sum(rloc * g, axis=0, keepdims=True))
                u_scr[pl.ds(tt, 1), :] = u
                p_scr[pl.ds(tt, 1), :] = p_col
                r_scr[pl.ds(tt, 1), :] = r_col
                return 0

            jax.lax.fori_loop(0, sub, body, 0)

    # apply the sub-block operators in stream order (G_1 first)
    lt = l_in[0]
    bt = b_tile[0]
    for j in range(nb):
        lo = j * sub
        uj = u_scr[pl.ds(lo, sub), :]
        rj = r_scr[pl.ds(lo, sub), :]
        pj = p_scr[pl.ds(lo, sub), :]
        t1 = jax.lax.dot_general(lt, rj, (((1,), (1,)), ((), ())), precision=hi)
        lt = lt + jnp.dot(t1, uj, precision=hi)
        t2 = jax.lax.dot_general(bt, pj, (((1,), (1,)), ((), ())), precision=hi)
        bt = bt + jnp.dot(t2, uj, precision=hi)
    l_out[:] = lt[None]
    b_out[:] = bt[None]


def _fused_chunk_kernel_coord(
    s_in, l_in, b_full, b_tile, l_out, b_out,
    p0_scr, m_scr, u_scr, p_scr, r_scr, tl_scr, tb_scr,
    *, k: int,
):
    """Coordinate-space variant of :func:`_fused_chunk_kernel_batched`.

    Every factor vector of the chunk recursion lives in span{p0 rows}, so
    the k sequential steps can run on k-dim COORDINATES with inner
    products taken through the k x k Gram matrix M = P0 P0^T:

        u_t = alpha_t P0,  p_col_t = ptilde_t P0,  r_col_t = rtilde_t P0

    turning the O(k m)-per-step scalar-chain body of the flat recursion
    into an O(k)-per-step one (the (k, k) rows are ~m/k times cheaper to
    reduce and store), while the applies contract through P0:

        L_tile += (L_tile @ P0^T) @ (Rt^T Ut) @ P0   (and B with Pt^T Ut)

    — the same 2 tile*m*k MXU MACs as the flat apply. Exact same
    real-number algebra (verified against the flat recursion); fp differs
    only by the Gram-space association of the inner products.

    MEASURED NO FASTER on v5e (142 vs 124 us marginal per chunk at
    m=900, k=128) and the scoped-VMEM envelope does not widen in practice
    (compile OOMs at (1216, 128) like the flat kernel — the (m, m) B
    block and tile pipeline dominate, and the accounting is non-monotone
    in m). Root cause, established with a minimal dependent-step probe
    kernel: EVERY per-point-exact sequential step pays a ~0.8 us
    vector-reduce -> scalar -> vector turnaround on this hardware,
    independent of row width (900 vs 128), loop unrolling, or keeping the
    reduction in (1,1) vector form — so shrinking the O(k m) row work to
    O(k) moves nothing. The flat kernel at ~0.97 us/step is ~85% of that
    floor. Kept as the reference implementation of this analysis; see
    DESIGN.md."""
    i = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(i == 0)
    def _():
        u_scr[:] = jnp.zeros_like(u_scr)
        p_scr[:] = jnp.zeros_like(p_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        p0_scr[:] = jnp.dot(s_in[0], b_full[0], precision=hi)
        m_scr[:] = jax.lax.dot_general(
            p0_scr[:], p0_scr[:], (((1,), (1,)), ((), ())), precision=hi
        )

        col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

        def body(t, _):
            mt = m_scr[pl.ds(t, 1), :]  # (1, k) = M[t, :] (M symmetric)
            a = jnp.sum(p_scr[:] * mt, axis=1, keepdims=True)  # (k, 1)
            pi = jnp.where(col == t, 1.0, 0.0) + jnp.sum(
                u_scr[:] * a, axis=0, keepdims=True
            )  # (1, k)
            mpi = jnp.sum(m_scr[:] * pi, axis=1, keepdims=True)  # (k, 1)
            s2 = jnp.maximum(jnp.sum(pi * mpi.T), 0.0)
            s = jnp.sqrt(s2)
            inv_s = jnp.where(s > 1e-20, 1.0 / jnp.maximum(s, 1e-20), 0.0)
            alpha = pi * inv_s  # (1, k)
            c = jnp.sqrt(s2 + 1.0) - 1.0
            d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0
            malpha = mpi.T * inv_s  # (1, k) = (M alpha)^T
            g = jnp.sum(u_scr[:] * malpha, axis=1, keepdims=True)  # (k, 1)
            p_col = d * (alpha + jnp.sum(p_scr[:] * g, axis=0, keepdims=True))
            r_col = c * (alpha + jnp.sum(r_scr[:] * g, axis=0, keepdims=True))
            u_scr[pl.ds(t, 1), :] = alpha
            p_scr[pl.ds(t, 1), :] = p_col
            r_scr[pl.ds(t, 1), :] = r_col
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        # chunk operators in Gram space: C_l = I + P0^T (Rt^T Ut) P0
        tl_scr[:] = jax.lax.dot_general(
            r_scr[:], u_scr[:], (((0,), (0,)), ((), ())), precision=hi
        )
        tb_scr[:] = jax.lax.dot_general(
            p_scr[:], u_scr[:], (((0,), (0,)), ((), ())), precision=hi
        )

    lt = l_in[0]
    x1 = jax.lax.dot_general(lt, p0_scr[:], (((1,), (1,)), ((), ())), precision=hi)
    l_out[:] = (lt + jnp.dot(jnp.dot(x1, tl_scr[:], precision=hi),
                             p0_scr[:], precision=hi))[None]
    bt = b_tile[0]
    x2 = jax.lax.dot_general(bt, p0_scr[:], (((1,), (1,)), ((), ())), precision=hi)
    b_out[:] = (bt + jnp.dot(jnp.dot(x2, tb_scr[:], precision=hi),
                             p0_scr[:], precision=hi))[None]


@functools.partial(jax.jit, static_argnames=("interpret", "sub", "mode"))
def pallas_blocked_chunk_batched(L, B, S, interpret: bool = False,
                                 sub: int | None = None, mode: str = "flat"):
    """Batched-over-outputs :func:`pallas_blocked_chunk`: one pallas_call
    covering all output batches (grid (Bd, row-tiles)) instead of a Python
    unroll.

    Args:
      L, B: (Bd, m, m) float32; S: (Bd, k, m) float32 stencil rows.
      sub: two-level recursion sub-block size (must divide k); default =
        k, the flat recursion. MEASURED SLOWER when < k on v5e at
        (m=900, k=128): 217 vs 124 us marginal per chunk at sub=32 — the
        sequential step cost is dominated by the per-step scalar
        dependency chain (norm -> rsqrt -> scaled row store), not by the
        O(k m) reductions the sub-blocking shrinks, so the extra
        cross-correction matmuls and per-sub-block applies only add
        overhead. Kept as an option because the hierarchy is exact (fp
        reassociation only, interpret-parity-tested) and the trade-off
        may flip on parts with different VPU/scalar latency balance.

    Returns (L', B') with leading Bd dim.
    """
    Bd, m = L.shape[0], L.shape[-1]
    k = S.shape[1]
    if sub is None:
        sub = k
    if k % sub:
        raise ValueError(f"sub={sub} must divide the chunk rank k={k}")
    tile = 128
    grid = (Bd, pl.cdiv(m, tile))
    if mode == "coord":
        kernel = functools.partial(_fused_chunk_kernel_coord, k=k)
        scratch = [
            pltpu.VMEM((k, m), jnp.float32),  # P0
            pltpu.VMEM((k, k), jnp.float32),  # M
            pltpu.VMEM((k, k), jnp.float32),  # Ut
            pltpu.VMEM((k, k), jnp.float32),  # Pt
            pltpu.VMEM((k, k), jnp.float32),  # Rt
            pltpu.VMEM((k, k), jnp.float32),  # TL = Rt^T Ut
            pltpu.VMEM((k, k), jnp.float32),  # TB = Pt^T Ut
        ]
    elif mode == "flat":
        kernel = functools.partial(_fused_chunk_kernel_batched, k=k, sub=sub)
        scratch = [
            pltpu.VMEM((k, m), jnp.float32),
            pltpu.VMEM((k, m), jnp.float32),
            pltpu.VMEM((k, m), jnp.float32),
            pltpu.VMEM((k, m), jnp.float32),
        ]
    else:
        raise ValueError(f"unknown chunk-kernel mode {mode!r} (flat/coord)")
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((1, k, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        out_shape=[
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
        ],
    )(S, L, B, B)
    return outs


def pallas_root_cache_update(
    cache: RootCache, v: jnp.ndarray, interpret: bool = False
) -> RootCache:
    """Drop-in for :func:`root_cache_update` on the q=1 hot path (one
    batched kernel covering every output, any batch size); falls back to
    the XLA path for other shapes/dtypes or (unless ``interpret``) non-TPU
    backends. Slim caches (``mat is None``) ride the roots-only kernel."""
    if (
        (jax.default_backend() != "tpu" and not interpret)
        or v.ndim != 3
        or v.shape[-1] != 1
        or cache.root.dtype != jnp.float32
    ):
        return root_cache_update(cache, v)
    if cache.mat is None:
        root, inv_root = pallas_rank1_update_slim_batched(
            cache.root, cache.inv_root, v, interpret=interpret
        )
        return RootCache(mat=None, root=root, inv_root=inv_root)
    root, inv_root, mat = pallas_rank1_update_batched(
        cache.root, cache.inv_root, cache.mat, v, interpret=interpret
    )
    return RootCache(mat=mat, root=root, inv_root=inv_root)
