"""Pallas TPU kernel: fused predict-then-condition chunk for the
grid-space predictive caches.

Runs one rank-k chunk of the interleaved prequential recursion (see
:mod:`online_gp_tpu.ops.pred_stream` for the math): per chunk the kernel

  step 0 (first row tile): computes all k rows C_0 w_t with one MXU matmul
    against the VMEM-resident covariance cache (C0W = S @ C_0, C_0
    symmetric), then runs the k-step factor recursion in VMEM scratch —
    two O(k m) VPU passes per point — emitting the per-point prequential
    moments (pred_mean_t = w_t^T mu_{t-1}, pred_var_t = w_t^T C_{t-1} w_t)
    and the factors Z, r;
  every tile: applies the deferred downdate C_tile -= (Z^T Z)_tile with a
    tiled f32 MXU matmul; mu' = mu + Z^T r rides the first tile.

HBM traffic per chunk is ~3 m^2 floats (C read twice — full block + row
tiles — and written once), so ~3 m^2 / k per point instead of the 2 m^2
the unblocked rank-1 downdate pays. The caches must be pre-padded to a
lane-tile multiple (:func:`pad_cache_to_tile`) so the per-tile scratch
column slices stay aligned; zero padding is exact (padded rows/cols stay
zero through every factor).

Off-TPU callers use the XLA scan in ``pred_stream.py``; the kernel itself
runs anywhere with ``interpret=True`` (the CPU parity tests do).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def pad_cache_to_tile(C: jnp.ndarray, mu: jnp.ndarray, tile: int = TILE):
    """Zero-pad (..., m, m) C and (..., m) mu to a multiple of the lane
    tile. Returns (C_pad, mu_pad, m_pad)."""
    m = C.shape[-1]
    m_pad = ((m + tile - 1) // tile) * tile
    if m_pad != m:
        pad = m_pad - m
        widths_c = [(0, 0)] * (C.ndim - 2) + [(0, pad), (0, pad)]
        widths_mu = [(0, 0)] * (mu.ndim - 1) + [(0, pad)]
        C = jnp.pad(C, widths_c)
        mu = jnp.pad(mu, widths_mu)
    return C, mu, m_pad


def _pred_chunk_kernel(
    s_in, y_in, nz_in, c_full, mu_in, c_tile,
    c_out, mu_out, pm_out, pv_out,
    c0w_scr, z_scr, r_scr, muw_scr,
    *, k: int, tile: int,
):
    i = pl.program_id(0)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(i == 0)
    def _():
        z_scr[:] = jnp.zeros_like(z_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        c0w_scr[:] = jnp.dot(s_in[:], c_full[:], precision=hi)  # (k, m)
        muw_scr[:] = jnp.dot(s_in[:], mu_in[:].T, precision=hi)  # (k, 1)

        def body(t, _):
            s_t = s_in[pl.ds(t, 1), :]  # (1, m)
            c0_t = c0w_scr[pl.ds(t, 1), :]  # (1, m)
            a = jnp.sum(z_scr[:] * s_t, axis=1, keepdims=True)  # (k, 1)
            ct = c0_t - jnp.sum(z_scr[:] * a, axis=0, keepdims=True)  # (1, m)
            wctw = jnp.sum(s_t * ct)
            pm = jnp.sum(muw_scr[pl.ds(t, 1), :]) + jnp.sum(r_scr[:] * a)
            y_t = jnp.sum(y_in[pl.ds(t, 1), :])
            nz_t = jnp.sum(nz_in[pl.ds(t, 1), :])
            beta = wctw + nz_t
            inv = jax.lax.rsqrt(jnp.maximum(beta, 1e-20))
            z_scr[pl.ds(t, 1), :] = ct * inv
            r_scr[pl.ds(t, 1), :] = jnp.full((1, 1), (y_t - pm) * inv)
            pm_out[pl.ds(t, 1), :] = jnp.full((1, 1), pm)
            pv_out[pl.ds(t, 1), :] = jnp.full((1, 1), wctw)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        mu_out[:] = mu_in[:] + jnp.sum(z_scr[:] * r_scr[:], axis=0, keepdims=True)

    zc = z_scr[:, pl.ds(i * tile, tile)]  # (k, tile) — aligned (m padded)
    dd = jax.lax.dot_general(zc, z_scr[:], (((0,), (0,)), ((), ())), precision=hi)
    c_out[:] = c_tile[:] - dd


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_pred_chunk(C, mu, S, y, nz, interpret: bool = False):
    """One fused predict-then-condition chunk.

    Args:
      C: (m, m) float32 covariance cache, m a multiple of 128 (pre-padded).
      mu: (m,) float32 mean cache.
      S: (k, m) float32 densified stencil rows (not noise-scaled).
      y: (k,) targets; nz: (k,) noise diagonal (pre-clamped).

    Returns (C', mu', pred_mean (k,), pred_var (k,)).
    """
    m = C.shape[-1]
    k = S.shape[0]
    grid = (m // TILE,)
    kernel = functools.partial(_pred_chunk_kernel, k=k, tile=TILE)
    C2, mu2, pm, pv = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((k, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # S
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),  # y
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),  # nz
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # C full
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),  # mu
            pl.BlockSpec((TILE, m), lambda i: (i, 0), memory_space=pltpu.VMEM),  # C tile
        ],
        out_specs=[
            pl.BlockSpec((TILE, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((1, m), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, m), jnp.float32),  # C0W
            pltpu.VMEM((k, m), jnp.float32),  # Z
            pltpu.VMEM((k, 1), jnp.float32),  # r
            pltpu.VMEM((k, 1), jnp.float32),  # mu0W
        ],
    )(S, y.reshape(k, 1), nz.reshape(k, 1), C, mu.reshape(1, m), C)
    return C2, mu2[0], pm[:, 0], pv[:, 0]


def _pred_chunk_kernel_batched(
    s_in, y_in, nz_in, c_full, mu_in, c_tile,
    c_out, mu_out, pm_out, pv_out,
    c0w_scr, z_scr, r_scr, muw_scr,
    *, k: int, tile: int,
):
    """Batched-over-outputs :func:`_pred_chunk_kernel`: grid dim 0 selects
    the output batch, dim 1 the row tile (batch-major order, so each
    batch's factor recursion runs before its tiles). The stencil S is
    shared across outputs; y/nz/caches are per-output."""
    i = pl.program_id(1)
    hi = jax.lax.Precision.HIGHEST

    @pl.when(i == 0)
    def _():
        z_scr[:] = jnp.zeros_like(z_scr)
        r_scr[:] = jnp.zeros_like(r_scr)
        c0w_scr[:] = jnp.dot(s_in[:], c_full[0], precision=hi)
        muw_scr[:] = jnp.dot(s_in[:], mu_in[0].T, precision=hi)

        def body(t, _):
            s_t = s_in[pl.ds(t, 1), :]
            c0_t = c0w_scr[pl.ds(t, 1), :]
            a = jnp.sum(z_scr[:] * s_t, axis=1, keepdims=True)
            ct = c0_t - jnp.sum(z_scr[:] * a, axis=0, keepdims=True)
            wctw = jnp.sum(s_t * ct)
            pm = jnp.sum(muw_scr[pl.ds(t, 1), :]) + jnp.sum(r_scr[:] * a)
            y_t = jnp.sum(y_in[0, pl.ds(t, 1), :])
            nz_t = jnp.sum(nz_in[0, pl.ds(t, 1), :])
            beta = wctw + nz_t
            inv = jax.lax.rsqrt(jnp.maximum(beta, 1e-20))
            z_scr[pl.ds(t, 1), :] = ct * inv
            r_scr[pl.ds(t, 1), :] = jnp.full((1, 1), (y_t - pm) * inv)
            pm_out[0, pl.ds(t, 1), :] = jnp.full((1, 1), pm)
            pv_out[0, pl.ds(t, 1), :] = jnp.full((1, 1), wctw)
            return 0

        jax.lax.fori_loop(0, k, body, 0)
        mu_out[:] = (
            mu_in[0] + jnp.sum(z_scr[:] * r_scr[:], axis=0, keepdims=True)
        )[None]

    zc = z_scr[:, pl.ds(i * tile, tile)]
    dd = jax.lax.dot_general(zc, z_scr[:], (((0,), (0,)), ((), ())), precision=hi)
    c_out[:] = (c_tile[0] - dd)[None]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_pred_chunk_batched(C, mu, S, y, nz, interpret: bool = False):
    """Batched-over-outputs :func:`pallas_pred_chunk`: one pallas_call with
    grid (Bd, row-tiles) — compile and kernel count independent of the
    output/class batch.

    Args:
      C: (Bd, m, m) float32, m a multiple of 128 (pre-padded).
      mu: (Bd, m); S: (k, m) shared stencil rows; y, nz: (Bd, k).

    Returns (C', mu', pred_mean (Bd, k), pred_var (Bd, k)).
    """
    Bd, m = C.shape[0], C.shape[-1]
    k = S.shape[0]
    grid = (Bd, m // TILE)
    kernel = functools.partial(_pred_chunk_kernel_batched, k=k, tile=TILE)
    C2, mu2, pm, pv = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((k, m), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, m), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bd, m, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, 1, m), jnp.float32),
            jax.ShapeDtypeStruct((Bd, k, 1), jnp.float32),
            jax.ShapeDtypeStruct((Bd, k, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, m), jnp.float32),
            pltpu.VMEM((k, m), jnp.float32),
            pltpu.VMEM((k, 1), jnp.float32),
            pltpu.VMEM((k, 1), jnp.float32),
        ],
    )(S, y.reshape(Bd, k, 1), nz.reshape(Bd, k, 1), C, mu.reshape(Bd, 1, m), C)
    return C2, mu2[:, 0], pm[..., 0], pv[..., 0]
