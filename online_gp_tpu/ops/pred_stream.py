"""Blocked interleaved predict-then-condition streaming of the grid-space
predictive caches.

The reference's prequential online loop
(``/root/reference/experiments/regression.py:49-54``) evaluates each point
BEFORE absorbing it; per-point decisions preclude the bulk blocked
absorption of :func:`online_gp_tpu.ops.root_update.roots_stream_blocked`.
This module removes that penalty for the predictive caches: the grid-space
posterior ``N(mu, s2*C)`` (see
:func:`online_gp_tpu.models.wiski.wiski_prediction_caches`) conditions on a
single SKI observation ``y_t = w_t^T u + eps`` as the rank-1 downdate

    beta_t = w_t^T C_{t-1} w_t + nz_t
    z_t    = C_{t-1} w_t / sqrt(beta_t)
    r_t    = (y_t - w_t^T mu_{t-1}) / sqrt(beta_t)
    mu_t   = mu_{t-1} + r_t z_t,      C_t = C_{t-1} - z_t z_t^T

and the per-point *prediction* (the prequential evaluate) is exactly the
two scalars the recursion already computes:

    pred_mean_t = w_t^T mu_{t-1},     pred_var_t = w_t^T C_{t-1} w_t.

Blocked form over a rank-k chunk: with Z_t = [z_1..z_t],
C_{t-1} w_t = C_0 w_t - Z (Z^T w_t), and all k rows C_0 w_t come from ONE
MXU matmul S @ C_0 (S the densified stencil rows, C_0 symmetric). The
sequential part of each step is two O(k m) VPU passes; the O(m^2) cache
updates defer to the chunk boundary (C -= Z^T Z on the MXU). HBM traffic
drops from 2 m^2 floats per point to ~2 m^2 / k, identical math to the
sequential recursion (fp reassociation only).

On TPU the chunk runs as one fused Pallas kernel
(:mod:`online_gp_tpu.ops.pallas_pred_stream`); elsewhere (and for the f64
parity oracles) the pure-XLA scan below computes the same factors.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.ops.root_update import pad_and_chunk_stream, stencil_rows


def pred_chunk_fits_vmem(m: int, k: int) -> bool:
    """Admissibility of the fused pred-chunk kernel, from a calibrated
    scoped-VMEM estimate against the DETECTED core budget
    (:mod:`online_gp_tpu.ops.vmem`).

    The kernel's scoped footprint (2 (k, m) scratch factors, the (k, m)
    stencil block, the VMEM-resident (m, m) covariance cache, pipelined C
    row tiles) must stay under the core's scoped limit or compilation
    fails. The affine model below is FIT THROUGH the v5e-measured OOM
    report sizes — (1280, 192) 16.05 MB, (1408, 128) 16.19 MB — and
    reproduces every measured admit/reject outcome at the 16 MB threshold
    (OK: (900, 128..384), (1024..1280, 128); table in
    ``tests/ops/test_vmem_gate.py``), so on a 16 MB part the gate equals
    the measured v5e table and on other budgets it scales. Callers can
    force the kernel with ``use_pallas=True``."""
    from online_gp_tpu.ops.vmem import affine_footprint_mb, vmem_limit_mb

    return affine_footprint_mb(m, k, 5.241, 25.37, 1.227) <= vmem_limit_mb()


def pred_chunk_xla(
    C: jnp.ndarray,
    mu: jnp.ndarray,
    S: jnp.ndarray,
    y: jnp.ndarray,
    nz: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One rank-k predict-then-condition chunk, pure XLA (any backend/dtype).

    Args:
      C: (m, m) covariance cache; mu: (m,) mean cache.
      S: (k, m) densified stencil rows (NOT noise-scaled).
      y: (k,) targets; nz: (k,) per-point noise (clamped by the caller).

    Returns (C', mu', pred_mean (k,), pred_var (k,)) where pred_* are the
    prequential moments w_t^T mu_{t-1} and w_t^T C_{t-1} w_t.
    """
    with jax.default_matmul_precision("float32"):
        c0w = S @ C  # (k, m): row t = (C_0 w_t)^T (C symmetric)
        mu0w = S @ mu  # (k,)
        Z, r, pms, pvs = pred_chunk_factors(S, c0w, mu0w, y, nz)
        new_C = C - Z.T @ Z
        new_mu = mu + Z.T @ r
    return new_C, new_mu, pms, pvs


def pred_chunk_factors(
    S: jnp.ndarray,
    c0w: jnp.ndarray,
    mu0w: jnp.ndarray,
    y: jnp.ndarray,
    nz: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The sequential factor recursion of one predict-then-condition chunk.

    Given the chunk-start projections c0w = S C_0 (k, m) and
    mu0w = S mu_0 (k,), runs the O(k^2 m) dependent part and returns
    (Z (k, m), r (k,), pred_mean (k,), pred_var (k,)) with the boundary
    updates C' = C - Z^T Z, mu' = mu + Z^T r left to the caller — the
    split that lets the tensor-parallel engine compute c0w/mu0w as one
    psum over row shards and keep the recursion replicated
    (:func:`online_gp_tpu.parallel.mesh.sharded_pred_stream_blocked`).
    """
    k, m = S.shape
    dtype = S.dtype

    def step(carry, inp):
        Z, r = carry  # (k, m), (k,)
        s_t, c0_t, mu0w_t, y_t, nz_t, t = inp
        a = Z @ s_t  # (k,): a_j = z_j . w_t (rows >= t are zero)
        ct = c0_t - Z.T @ a  # (m,) = C_{t-1} w_t
        wctw = jnp.sum(s_t * ct)
        pm = mu0w_t + jnp.sum(r * a)
        beta = wctw + nz_t
        inv = jax.lax.rsqrt(jnp.maximum(beta, jnp.asarray(1e-20, dtype)))
        Z = Z.at[t].set(ct * inv)
        r = r.at[t].set((y_t - pm) * inv)
        return (Z, r), (pm, wctw)

    with jax.default_matmul_precision("float32"):
        (Z, r), (pms, pvs) = jax.lax.scan(
            step,
            (jnp.zeros((k, m), dtype), jnp.zeros((k,), dtype)),
            (S, c0w, mu0w, y, nz, jnp.arange(k)),
        )
    return Z, r, pms, pvs


def _pad_chunk_aux(a: jnp.ndarray, k: int, fill: float) -> jnp.ndarray:
    """Pad a per-point (n,) auxiliary stream to a multiple of k and chunk
    to (nc, k). Padding targets are 0 and padding noises 1: together with
    the zero-weight stencil padding of :func:`pad_and_chunk_stream` the
    padded steps are exact no-ops (z = 0, r = 0)."""
    n = a.shape[0]
    pad = (-n) % k
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(-1, k)


def pred_stream_blocked(
    C: jnp.ndarray,
    mu: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    y: jnp.ndarray,
    nz: jnp.ndarray,
    block: int = 128,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Interleaved predict-then-condition over a whole stream, blocked.

    Semantically identical to the per-point loop {predict at x_t from the
    caches conditioned on points < t; condition on (x_t, y_t)} — i.e. the
    reference's evaluate-then-update prequential hot loop
    (``experiments/regression.py:49-54``) — restructured so the O(m^2)
    cache updates land on the MXU once per rank-``block`` chunk.

    Args:
      C: (m, m) covariance cache; mu: (m,) mean cache.
      idx, wv: (n, P) stencil indices/weights (NOT noise-scaled).
      y: (n,) targets; nz: (n,) noise diagonal (pre-clamped).
      block: chunk rank k.
      use_pallas: run chunks as the fused TPU kernel (default: on TPU for
        float32); the XLA scan otherwise.
      pallas_interpret: interpret-mode kernel (CPU parity tests).

    Returns (C', mu', pred_mean (n,), pred_var (n,)).
    """
    m = C.shape[-1]
    dtype = C.dtype
    k_ub = int(min(block, max(idx.shape[0], 1)))
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and pred_chunk_fits_vmem(m, k_ub)
        )
    if use_pallas and dtype != jnp.float32:
        raise TypeError(
            f"the fused Pallas pred-chunk kernel is float32-only (got {dtype}); "
            "pass use_pallas=False for other dtypes"
        )

    n = idx.shape[0]
    idx_c, wv_c, k = pad_and_chunk_stream(idx, wv, block)
    y_c = _pad_chunk_aux(y, k, 0.0)
    nz_c = _pad_chunk_aux(nz, k, 1.0)
    nc = idx_c.shape[0]

    if use_pallas:
        from online_gp_tpu.ops.pallas_pred_stream import (
            pallas_pred_chunk,
            pad_cache_to_tile,
        )

        # pad the caches to a lane-tile multiple once so the kernel's
        # per-tile scratch slices stay aligned (zero padding is exact:
        # padded rows/cols of C and S are zero so every factor inherits
        # zeros there)
        C_p, mu_p, m_pad = pad_cache_to_tile(C, mu)

        def chunk_step(carry, inp):
            Cc, muc = carry
            ic, wc, yc, nzc = inp
            S = stencil_rows(ic, wc, m)  # (k, m)
            if m_pad != m:
                S = jnp.pad(S, ((0, 0), (0, m_pad - m)))
            Cc, muc, pm, pv = pallas_pred_chunk(
                Cc, muc, S, yc, nzc, interpret=pallas_interpret
            )
            return (Cc, muc), (pm, pv)

        (C_p, mu_p), (pms, pvs) = jax.lax.scan(
            chunk_step, (C_p, mu_p), (idx_c, wv_c, y_c, nz_c)
        )
        new_C, new_mu = C_p[:m, :m], mu_p[:m]
    else:

        def chunk_step(carry, inp):
            Cc, muc = carry
            ic, wc, yc, nzc = inp
            S = stencil_rows(ic, wc, m)
            Cc, muc, pm, pv = pred_chunk_xla(Cc, muc, S, yc, nzc)
            return (Cc, muc), (pm, pv)

        (new_C, new_mu), (pms, pvs) = jax.lax.scan(
            chunk_step, (C, mu), (idx_c, wv_c, y_c, nz_c)
        )

    return new_C, new_mu, pms.reshape(nc * k)[:n], pvs.reshape(nc * k)[:n]


def pred_stream_blocked_batched(
    C: jnp.ndarray,
    mu: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    y: jnp.ndarray,
    nz: jnp.ndarray,
    block: int = 128,
    use_pallas: Optional[bool] = None,
    pallas_interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched-over-outputs :func:`pred_stream_blocked`: the stencil
    (idx, wv) is shared across outputs, targets/noise/caches are
    per-output; all outputs ride one fused kernel per chunk on TPU.

    Args:
      C: (Bd, m, m); mu: (Bd, m); idx, wv: (n, P); y, nz: (Bd, n).

    Returns (C', mu', pred_mean (Bd, n), pred_var (Bd, n)).
    """
    Bd, m = C.shape[0], C.shape[-1]
    dtype = C.dtype
    k_ub = int(min(block, max(idx.shape[0], 1)))
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and pred_chunk_fits_vmem(m, k_ub)
        )
    if not use_pallas:
        return jax.vmap(
            lambda Cb, mub, yb, nzb: pred_stream_blocked(
                Cb, mub, idx, wv, yb, nzb, block=block, use_pallas=False
            )
        )(C, mu, y, nz)

    from online_gp_tpu.ops.pallas_pred_stream import (
        pallas_pred_chunk_batched,
        pad_cache_to_tile,
    )

    n = idx.shape[0]
    idx_c, wv_c, k = pad_and_chunk_stream(idx, wv, block)
    y_c = jax.vmap(lambda a: _pad_chunk_aux(a, k, 0.0))(y)  # (Bd, nc, k)
    nz_c = jax.vmap(lambda a: _pad_chunk_aux(a, k, 1.0))(nz)
    nc = idx_c.shape[0]
    C_p, mu_p, m_pad = pad_cache_to_tile(C, mu)

    def chunk_step(carry, inp):
        Cc, muc = carry
        ic, wc, yc, nzc = inp  # yc/nzc: (Bd, k)
        S = stencil_rows(ic, wc, m)
        if m_pad != m:
            S = jnp.pad(S, ((0, 0), (0, m_pad - m)))
        Cc, muc, pm, pv = pallas_pred_chunk_batched(
            Cc, muc, S, yc, nzc, interpret=pallas_interpret
        )
        return (Cc, muc), (pm, pv)

    (C_p, mu_p), (pms, pvs) = jax.lax.scan(
        chunk_step,
        (C_p, mu_p),
        (idx_c, wv_c, y_c.swapaxes(0, 1), nz_c.swapaxes(0, 1)),
    )
    # (nc, Bd, k) -> (Bd, n)
    pms = pms.swapaxes(0, 1).reshape(Bd, nc * k)[:, :n]
    pvs = pvs.swapaxes(0, 1).reshape(Bd, nc * k)[:, :n]
    return C_p[:, :m, :m], mu_p[:, :m], pms, pvs
