"""Maintained matrix roots with exact O(m^2 q) rank-q updates.

This is the TPU-native heart of WISKI's constant-time conditioning. The
reference maintains the root L and inverse root B of the SKI Gram matrix
A = W D^{-1} W^T (A = L L^T, A^{-1} = B B^T) inside
``online_gp/lazy/updated_root_lazy_tensor.py`` — its ``collect_vector``
takes a *full* SVD of p = B^T v (``updated_root_lazy_tensor.py:82``,
``some=False``), an O(m^3) op per update.

TPU-first derivation (same math, no full SVD): matrix roots are only
defined up to right-multiplication by an orthogonal matrix, so with the
thin SVD p = U_q S V^T (U_q: m×q),

    A + v v^T = L (I + p p^T) L^T
              = [L (I + U_q diag(c) U_q^T)] [·]^T,  c = sqrt(S^2+1) - 1

because (I + U_q diag(c) U_q^T)^2 = I + U_q diag(S^2) U_q^T = I + p p^T.
Likewise B_new = B (I + U_q diag(d) U_q^T) with d = 1/sqrt(S^2+1) - 1
keeps B_new^T L_new = I exactly ((1+c)(1+d) = 1). Both updates are three
m×q / m×m-free matmuls — O(m^2 q), MXU-shaped, and *exact* (the reference's
update is exact only in the full-rank regime it reaches via Cholesky +
jitter; we initialize the same way, see ``root_cache_init``).

The thin SVD of the m×q matrix p is computed from the q×q Gram eigh
(q is 1 for point-streaming), so nothing bigger than q×q is factorized.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from online_gp_tpu.ops.chol import psd_safe_cholesky, inv_lower_transpose


class RootCache(NamedTuple):
    """A = mat = root @ root^T with inv_root @ inv_root^T = A^{-1}.

    Pytree analog of the reference's ``UpdatedRootLazyTensor`` state
    (tensor, root, inverse root).

    ``mat`` may be ``None`` ("slim" mode, see :func:`root_cache_slim`):
    the exact Gram accumulator is dropped from the streaming state and the
    rank-q update touches only the two roots — 4 m^2 floats of HBM traffic
    per update instead of 6. ``root @ root^T`` equals the accumulated A in
    exact arithmetic (the update is exact algebra), so the accumulator can
    be rebuilt on demand (:func:`root_cache_rebuild_mat`) at the cost of
    losing A's lower f32 accumulation error as the refresh anchor."""

    mat: Optional[jnp.ndarray]  # (..., m, m) or None (slim mode)
    root: jnp.ndarray  # (..., m, m)
    inv_root: jnp.ndarray  # (..., m, m)


def root_cache_init(mat: jnp.ndarray, jitter: float = 1e-4) -> RootCache:
    """Initialize roots from a dense PSD matrix.

    Matches the reference's first-call fallback
    (``updated_root_lazy_tensor.py:121-133``), which for m below gpytorch's
    ``max_cholesky_size`` resolves to a jittered Cholesky: A may be rank
    deficient early in a stream (n < m), so the maintained roots actually
    track A + eps*I — the same tiny, documented bias as the reference.
    """
    chol = psd_safe_cholesky(mat, jitter=jitter)
    inv_root = inv_lower_transpose(chol)
    return RootCache(mat=mat, root=chol, inv_root=inv_root)


def root_cache_slim(cache: RootCache) -> RootCache:
    """Drop the exact Gram accumulator from the streaming state (opt-in).

    The rank-q update then reads/writes only (root, inv_root); see the
    class docstring for the accuracy trade-off."""
    return cache._replace(mat=None)


def root_cache_rebuild_mat(cache: RootCache) -> RootCache:
    """Rebuild A = root @ root^T for a slim cache (no-op when present)."""
    if cache.mat is not None:
        return cache
    with jax.default_matmul_precision("float32"):
        mat = jnp.einsum("...ik,...jk->...ij", cache.root, cache.root)
    return cache._replace(mat=mat)


def root_cache_update(cache: RootCache, v: jnp.ndarray) -> RootCache:
    """Rank-q update A <- A + v v^T with O(m^2 q) root maintenance.

    Args:
      cache: current roots.
      v: (..., m, q) update vectors (q static; q=1 for point streams).

    Returns:
      updated RootCache.
    """
    with jax.default_matmul_precision("float32"):
        return _root_cache_update_impl(cache, v)


def _root_cache_update_impl(cache: RootCache, v: jnp.ndarray) -> RootCache:
    L, B = cache.root, cache.inv_root
    p = jnp.einsum("...ji,...jq->...iq", B, v)  # B^T v: (..., m, q)

    q = p.shape[-1]
    if q == 1:
        # rank-1 fast path (the streaming hot loop): trivial thin SVD.
        s2 = jnp.sum(p * p, axis=(-2, -1))[..., None]  # (..., 1)
        s = jnp.sqrt(s2)
        safe_s = jnp.maximum(s, jnp.asarray(1e-20, p.dtype))
        U = p / safe_s[..., None, :]
    else:
        # Thin SVD of p via the q×q Gram matrix: p^T p = V diag(S^2) V^T.
        gram = jnp.einsum("...iq,...ir->...qr", p, p)
        s2, V = jnp.linalg.eigh(gram)  # ascending eigenvalues
        s2 = jnp.maximum(s2, 0.0)
        s = jnp.sqrt(s2)
        # U_q = p V / S; a zero singular value means that direction
        # contributes nothing (c = d = 0 below), so guard the division.
        safe_s = jnp.maximum(s, jnp.asarray(1e-20, p.dtype))
        U = jnp.einsum("...iq,...qr->...ir", p, V) / safe_s[..., None, :]

    c = jnp.sqrt(s2 + 1.0) - 1.0  # root eigenvalue update
    d = 1.0 / jnp.sqrt(s2 + 1.0) - 1.0  # inverse-root eigenvalue update
    # guard: if s == 0, U column is garbage — zero its contribution.
    valid = (s > 0).astype(p.dtype)
    c = c * valid
    d = d * valid

    LU = jnp.einsum("...ij,...jq->...iq", L, U)
    BU = jnp.einsum("...ij,...jq->...iq", B, U)
    new_root = L + jnp.einsum("...iq,...jq->...ij", LU * c[..., None, :], U)
    new_inv_root = B + jnp.einsum("...iq,...jq->...ij", BU * d[..., None, :], U)
    if cache.mat is None:  # slim mode: no Gram accumulator in the hot state
        new_mat = None
    else:
        new_mat = cache.mat + jnp.einsum("...iq,...jq->...ij", v, v)
    return RootCache(mat=new_mat, root=new_root, inv_root=new_inv_root)


def roots_apply_rank1_p(L: jnp.ndarray, B: jnp.ndarray, p: jnp.ndarray):
    """Rank-1 root update given p = B^T v directly.

    The SKI update vector v is sparse (4^D stencil weights), so the caller
    can form p with an O(P m) row gather of B instead of the dense m^2
    reduction — this applies the remaining O(m^2) outer-product updates:

        L' = L + c (L u) u^T,   B' = B + d (B u) u^T,
        u = p/|p|, c = sqrt(|p|^2+1)-1, d = 1/sqrt(|p|^2+1)-1.

    Args:
      L, B: (..., m, m) root / inverse root; p: (..., m).

    Returns (L', B').
    """
    with jax.default_matmul_precision("float32"):
        s2 = jnp.sum(p * p, axis=-1, keepdims=True)  # (..., 1)
        s = jnp.sqrt(s2)
        safe_s = jnp.maximum(s, jnp.asarray(1e-20, p.dtype))
        u = p / safe_s
        valid = (s > 0).astype(p.dtype)
        c = (jnp.sqrt(s2 + 1.0) - 1.0) * valid
        d = (1.0 / jnp.sqrt(s2 + 1.0) - 1.0) * valid
        Lu = jnp.einsum("...ij,...j->...i", L, u)
        Bu = jnp.einsum("...ij,...j->...i", B, u)
        new_L = L + (c * Lu)[..., :, None] * u[..., None, :]
        new_B = B + (d * Bu)[..., :, None] * u[..., None, :]
    return new_L, new_B


def stencil_rows(idx: jnp.ndarray, wv: jnp.ndarray, m: int) -> jnp.ndarray:
    """Densify sparse stencil rows: (k, P) indices/weights -> (k, m) with
    row t = sum_p wv[t,p] e_{idx[t,p]}. Implemented as a compare-reduce
    (XLA scatter on TPU serializes; this is 3 vectorized VPU passes)."""
    from online_gp_tpu.ops.interp import _densify_rows

    return _densify_rows(idx, wv, m)


def blocked_factors_xla(p0: jnp.ndarray):
    """Factor recursion for one rank-k blocked chunk, pure XLA (any
    backend/dtype): given p0 (k, m) with row t = B_chunk_start^T v_t,
    returns (U, P, R), each (k, m) row-layout, such that the chunk's k
    sequential rank-1 root updates compose to L(I + R^T U), B(I + P^T U).
    See :func:`roots_stream_blocked` for the derivation."""
    k, m = p0.shape
    dtype = p0.dtype

    def inner_step(carry, inp):
        U, Pm, R = carry
        p0_t, t = inp
        a = jnp.einsum("mk,m->k", Pm, p0_t)
        p = p0_t + jnp.einsum("mk,k->m", U, a)
        s2 = jnp.sum(p * p)
        s = jnp.sqrt(s2)
        safe_s = jnp.maximum(s, jnp.asarray(1e-20, dtype))
        u = p / safe_s
        valid = (s > 0).astype(dtype)
        c = (jnp.sqrt(s2 + 1.0) - 1.0) * valid
        d = (1.0 / jnp.sqrt(s2 + 1.0) - 1.0) * valid
        g = jnp.einsum("mk,m->k", U, u)
        p_col = d * (u + jnp.einsum("mk,k->m", Pm, g))
        r_col = c * (u + jnp.einsum("mk,k->m", R, g))
        U = U.at[:, t].set(u)
        Pm = Pm.at[:, t].set(p_col)
        R = R.at[:, t].set(r_col)
        return (U, Pm, R), 0.0

    z = jnp.zeros((m, k), dtype)
    (U, Pm, R), _ = jax.lax.scan(inner_step, (z, z, z), (p0, jnp.arange(k)))
    return U.T, Pm.T, R.T


def pad_and_chunk_stream(idx: jnp.ndarray, wv: jnp.ndarray, block: int):
    """Zero-pad a stencil stream to a multiple of the chunk rank and
    reshape to (nc, k, P). Zero-weight padding points are exact no-ops in
    the blocked recursion: p0 = 0 -> valid = 0 -> c = d = 0 and u = 0, so
    the appended factor columns vanish. Shared by the single-device and
    mesh-sharded blocked streams."""
    n, P = idx.shape
    k = int(min(block, max(n, 1)))
    pad = (-n) % k
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((pad, P), idx.dtype)], axis=0)
        wv = jnp.concatenate([wv, jnp.zeros((pad, P), wv.dtype)], axis=0)
    nc = (n + pad) // k
    return idx.reshape(nc, k, P), wv.reshape(nc, k, P), k


def fused_chunk_fits_vmem(m: int, k: int) -> bool:
    """Admissibility of the fused blocked chunk kernel, from a calibrated
    scoped-VMEM estimate against the DETECTED core budget
    (:mod:`online_gp_tpu.ops.vmem`).

    The kernel's scoped footprint (4 (k, m) scratch factors, the (k, m)
    stencil block, the VMEM-resident (m, m) inverse root, and the
    pipelined L/B row tiles) must stay under the core's scoped limit or
    compilation fails ("Ran out of memory in memory space vmem ... on
    stack"). The affine model below is FIT THROUGH the v5e-measured OOM
    report sizes — (1216, 128) 16.20 MB, (1280, 128) 17.14 MB, (900, 192)
    16.31 MB standalone — and reproduces every measured admit/reject
    outcome at the 16 MB threshold (OK: (900..1152, 128), (960, 160);
    OOM additionally: (900, 256) 17.62 MB, (1024, 160) 16.14 MB,
    (1536, 128) 18.75 MB; table in ``tests/ops/test_vmem_gate.py``). On a
    16 MB part the gate therefore equals the measured v5e table; on other
    budgets it scales. The compiler's accounting is context-dependent
    ((900, 256) compiles in-scan but OOMs standalone) — the calibration
    uses the strictest (standalone) context, so the gate may be MORE
    conservative than a given call site allows; callers that know their
    context can still force the kernel with ``use_pallas=True``."""
    from online_gp_tpu.ops.vmem import affine_footprint_mb, vmem_limit_mb

    return affine_footprint_mb(m, k, 1.852, 78.6, 1.227) <= vmem_limit_mb()


def roots_stream_blocked(
    L: jnp.ndarray,
    B: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    block: int = 32,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
):
    """Sequential rank-1 root updates over a whole stream, blocked for the MXU.

    Computes exactly the n-step recursion of :func:`roots_apply_rank1_p`
    over sparse update vectors v_t = sum_p wv[t,p] e_{idx[t,p]} (the SKI
    stencil), but restructured so the O(m^2) work lands on the MXU in
    rank-``block`` chunks instead of n HBM-bound rank-1 outer products.

    Key identity: each rank-1 step is a *right*-multiplication,

        L_t = L_{t-1} (I + c_t u_t u_t^T),  B_t = B_{t-1} (I + d_t u_t u_t^T),

    so a chunk of k steps is L_0 @ (I + R U^T) and B_0 @ (I + P U^T) where
    U = [u_1..u_k] and the columns of R/P follow from expanding the product
    of the symmetric rank-1 factors:

        g_t   = U^T u_t             (with only columns < t populated)
        r_t   = c_t (u_t + R g_t),  p_col_t = d_t (u_t + P g_t).

    The u_t themselves need p_t = B_{t-1}^T v_t; with F_j the B-side factors,
    B_{t-1}^T v = F_{t-1}..F_1 B_0^T v = (I + U P^T) p0_t  (F_j symmetric,
    transposition reverses the product), so the sequential part of each step
    is five (m, k) matvecs — O(k m) — and everything O(m^2) defers to two
    MXU matmuls per chunk. Per-update HBM traffic drops from 4 m^2 floats to
    ~4 m^2 / k.

    This supersedes the reference's per-point ``collect_vector`` hot loop
    (``online_gp/lazy/updated_root_lazy_tensor.py:69-119``) at identical
    math (same factors, different associativity — fp differences only).

    Args:
      L, B: (m, m) root / inverse root.
      idx: (n, P) int32 grid indices of the stencil points.
      wv: (n, P) stencil weights already divided by sqrt(noise_t).
      block: chunk size k (the deferred-update rank).
      use_pallas: run the inner factor recursion as one VMEM-resident
        Pallas kernel (default: on TPU for float32). The lax.scan of tiny
        matvecs is dominated by per-step launch glue on TPU.
      pallas_interpret: run the Pallas kernel in interpret mode (any
        backend; used by the CPU parity tests).

    Returns (L', B') after all n updates, in stream order.
    """
    m = L.shape[-1]
    dtype = L.dtype
    idx_c, wv_c, k = pad_and_chunk_stream(idx, wv, block)
    nc = idx_c.shape[0]
    if use_pallas is None:
        # the fused kernel keeps the (m, m) inverse root VMEM-resident
        # (plus 4 (k, m) scratch buffers and the L/B row tiles), so guard
        # on the measured scoped-VMEM envelope; larger (m, k) take the XLA
        # blocked path (same math)
        use_pallas = (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and fused_chunk_fits_vmem(m, k)
        )
    if use_pallas and dtype != jnp.float32:
        raise TypeError(
            f"the fused Pallas chunk kernel is float32-only (got {dtype}); "
            "pass use_pallas=False for other dtypes"
        )

    if use_pallas:
        # Fused-kernel path: one pallas call per chunk (stencil matmul
        # against the VMEM-resident inverse root + factor recursion +
        # tiled MXU apply). The dense stencil rows S are built BEFORE the
        # scan — a compare-reduce (XLA scatter on TPU serializes),
        # lax.map'd per chunk to bound the (k, P, m) broadcast
        # intermediate. Keeping the scan body to just the pallas call lets
        # XLA hold the (L, B) carry on-chip instead of round-tripping it
        # through HBM every chunk (measured ~15x). The hoisted S buffer is
        # O(n m), so very long streams are processed in bounded segments.
        from online_gp_tpu.ops.pallas_root_update import pallas_blocked_chunk

        def chunk_step_pallas(carry, S):
            Lc, Bc = carry
            Lc, Bc = pallas_blocked_chunk(Lc, Bc, S, interpret=pallas_interpret)
            return (Lc, Bc), 0.0

        seg_chunks = max(1, (16384 + k - 1) // k)  # <= ~64 MB of S at m=1280
        for c0 in range(0, nc, seg_chunks):
            idx_s = idx_c[c0 : c0 + seg_chunks]
            wv_s = wv_c[c0 : c0 + seg_chunks]
            s_seg = jax.lax.map(
                lambda args: stencil_rows(args[0], args[1], m), (idx_s, wv_s)
            )  # (<=seg_chunks, k, m)
            (L, B), _ = jax.lax.scan(chunk_step_pallas, (L, B), s_seg)
        return L, B

    def chunk_step(carry, inp):
        Lc, Bc = carry
        ic, wc = inp  # (k, P)
        p0 = jnp.einsum("kp,kpm->km", wc, Bc[ic])  # B_0^T v_t per point
        U, Pm, R = blocked_factors_xla(p0)
        Lc = Lc + (Lc @ R.T) @ U
        Bc = Bc + (Bc @ Pm.T) @ U
        return (Lc, Bc), 0.0

    with jax.default_matmul_precision("float32"):
        (L, B), _ = jax.lax.scan(chunk_step, (L, B), (idx_c, wv_c))
    return L, B


def roots_stream_blocked_batched(
    L: jnp.ndarray,
    B: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    block: int = 32,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
):
    """Batched-over-outputs :func:`roots_stream_blocked`: all output
    batches ride ONE fused Pallas chunk kernel per chunk (grid over
    outputs), so compile count and kernel count are independent of the
    class/output batch size.

    Args:
      L, B: (Bd, m, m) roots; idx: (n, P) shared stencil indices;
      wv: (Bd, n, P) per-output weights (already / sqrt(noise)).

    Returns (L', B') with leading Bd dim.
    """
    Bd, m = L.shape[0], L.shape[-1]
    dtype = L.dtype
    k_ub = int(min(block, max(idx.shape[0], 1)))  # chunk rank after padding
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and fused_chunk_fits_vmem(m, k_ub)
        )
    if not use_pallas:
        return jax.vmap(
            lambda Lb, Bb, wvb: roots_stream_blocked(
                Lb, Bb, idx, wvb, block=block, use_pallas=False
            )
        )(L, B, wv)

    from online_gp_tpu.ops.pallas_root_update import pallas_blocked_chunk_batched

    idx_c, _, k = pad_and_chunk_stream(idx, wv[0], block)
    n, P = idx.shape
    pad = (-n) % k
    if pad:
        wv = jnp.concatenate([wv, jnp.zeros((Bd, pad, P), wv.dtype)], axis=1)
    nc = idx_c.shape[0]
    wv_c = wv.reshape(Bd, nc, k, P).swapaxes(0, 1)  # (nc, Bd, k, P)

    def chunk_step(carry, inp):
        Lc, Bc = carry
        S = inp  # (Bd, k, m)
        Lc, Bc = pallas_blocked_chunk_batched(Lc, Bc, S, interpret=pallas_interpret)
        return (Lc, Bc), 0.0

    seg_chunks = max(1, (16384 + k - 1) // k)
    for c0 in range(0, nc, seg_chunks):
        idx_s = idx_c[c0 : c0 + seg_chunks]
        wv_s = wv_c[c0 : c0 + seg_chunks]
        s_seg = jax.lax.map(
            lambda args: jax.vmap(lambda w1: stencil_rows(args[0], w1, m))(args[1]),
            (idx_s, wv_s),
        )  # (<=seg_chunks, Bd, k, m)
        (L, B), _ = jax.lax.scan(chunk_step, (L, B), s_seg)
    return L, B


def root_cache_expand(cache: RootCache, batch_shape) -> RootCache:
    """Broadcast the cache along new leading batch dims (the reference's
    ``_expand_batch``, used for fantasy batching in q-acquisition;
    ``updated_root_lazy_tensor.py:139-159``)."""
    def expand(x):
        if x is None:
            return None
        return jnp.broadcast_to(x, tuple(batch_shape) + x.shape)

    return RootCache(*(expand(x) for x in cache))
