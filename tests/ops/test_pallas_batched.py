"""Parity of the batched-over-outputs Pallas kernels vs the XLA path.

Round-3 replacement of the per-output Python unroll: one pallas_call with
a (B, row-tiles) grid covers every output batch, so compile count and
kernel count are independent of the class batch (a 10-class Dirichlet
stream rides the fused kernel instead of silently losing it at B > 8).
Interpret mode on CPU, same discipline as tests/ops/test_pallas_root_update.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.ops.root_update import (
    RootCache,
    root_cache_init,
    root_cache_slim,
    root_cache_update,
    roots_apply_rank1_p,
    roots_stream_blocked,
)
from online_gp_tpu.ops.pallas_root_update import (
    pallas_blocked_chunk,
    pallas_blocked_chunk_batched,
    pallas_rank1_apply_batched,
    pallas_rank1_update_batched,
    pallas_rank1_update_slim_batched,
    pallas_root_cache_update,
)


def _make_cache(key, m, batch):
    W = jax.random.normal(key, (batch, m, m), dtype=jnp.float32)
    A = (jnp.einsum("...ik,...jk->...ij", W, W) / m + jnp.eye(m)).astype(jnp.float32)
    cache = root_cache_init(A)
    return RootCache(*(x.astype(jnp.float32) for x in cache))


@pytest.mark.parametrize("m,B", [(64, 3), (100, 10), (130, 2)])
def test_rank1_apply_batched_parity(m, B):
    """Batched apply (p given) == the XLA roots_apply_rank1_p, any B,
    including non-128-divisible m edge tiles and B > 8."""
    cache = _make_cache(jax.random.PRNGKey(m + B), m, B)
    p = jax.random.normal(jax.random.PRNGKey(1), (B, m), jnp.float32)
    Lp, Bp = pallas_rank1_apply_batched(cache.root, cache.inv_root, p, interpret=True)
    Lr, Br = roots_apply_rank1_p(cache.root, cache.inv_root, p)
    np.testing.assert_allclose(Lp, Lr, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Bp, Br, rtol=1e-5, atol=1e-5)


def test_rank1_update_batched_full_parity():
    """Batched full kernel (roots + Gram) == root_cache_update at B=10."""
    m, B = 96, 10
    cache = _make_cache(jax.random.PRNGKey(3), m, B)
    v = jax.random.normal(jax.random.PRNGKey(4), (B, m, 1), jnp.float32)
    Lp, Bp, Ap = pallas_rank1_update_batched(
        cache.root, cache.inv_root, cache.mat, v, interpret=True
    )
    ref = root_cache_update(cache, v)
    np.testing.assert_allclose(Ap, ref.mat, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Lp, ref.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Bp, ref.inv_root, rtol=1e-5, atol=1e-5)


def test_rank1_update_slim_batched_parity():
    m, B = 80, 5
    cache = root_cache_slim(_make_cache(jax.random.PRNGKey(5), m, B))
    v = jax.random.normal(jax.random.PRNGKey(6), (B, m, 1), jnp.float32)
    Lp, Bp = pallas_rank1_update_slim_batched(
        cache.root, cache.inv_root, v, interpret=True
    )
    ref = root_cache_update(cache, v)
    np.testing.assert_allclose(Lp, ref.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Bp, ref.inv_root, rtol=1e-5, atol=1e-5)


def test_cache_update_large_batch_uses_kernel():
    """pallas_root_cache_update no longer falls back at B > 8 — the
    batched kernel must be numerically live for a 10-class cache."""
    m, B = 64, 10
    cache = _make_cache(jax.random.PRNGKey(7), m, B)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, m, 1), jnp.float32)
    out = pallas_root_cache_update(cache, v, interpret=True)
    ref = root_cache_update(cache, v)
    np.testing.assert_allclose(out.root, ref.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.mat, ref.mat, rtol=1e-5, atol=1e-5)


def test_cache_update_f64_routes_to_xla():
    """Non-f32 roots (jax x64 parity oracles) must take the XLA path
    rather than downcasting through the f32-only kernel."""
    m, B = 32, 2
    cache = _make_cache(jax.random.PRNGKey(9), m, B)
    cache64 = RootCache(*(x.astype(jnp.float64) for x in cache))
    v = jax.random.normal(jax.random.PRNGKey(10), (B, m, 1), jnp.float64)
    out = pallas_root_cache_update(cache64, v, interpret=True)
    assert out.root.dtype == cache64.root.dtype
    ref = root_cache_update(cache64, v)
    np.testing.assert_allclose(out.root, ref.root, rtol=1e-10, atol=1e-10)


def test_blocked_chunk_batched_parity():
    """Batched fused chunk kernel == per-output single-batch kernel ==
    the XLA blocked recursion, with per-batch scratch re-initialization."""
    m, B, k = 100, 4, 8
    cache = _make_cache(jax.random.PRNGKey(11), m, B)
    S = jax.random.normal(jax.random.PRNGKey(12), (B, k, m), jnp.float32) * 0.3
    Lb, Bb = pallas_blocked_chunk_batched(cache.root, cache.inv_root, S, interpret=True)
    for b in range(B):
        Ls, Bs = pallas_blocked_chunk(
            cache.root[b], cache.inv_root[b], S[b], interpret=True
        )
        np.testing.assert_allclose(Lb[b], Ls, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(Bb[b], Bs, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_stream_blocked_batched_matches_vmapped_xla():
    """roots_stream_blocked_batched (pallas interpret) == vmapped XLA
    blocked stream over a 30-point stencil stream, B=3."""
    from online_gp_tpu.ops.root_update import roots_stream_blocked_batched
    from online_gp_tpu.ops.grid import Grid
    from online_gp_tpu.ops.interp import interp_coeffs

    m_side, B = 10, 3
    grid = Grid.create([(-1.1, 1.1)] * 2, m_side)
    cache = _make_cache(jax.random.PRNGKey(13), grid.num_points, B)
    xs = jax.random.uniform(jax.random.PRNGKey(14), (30, 2), minval=-1, maxval=1)
    idx, w = interp_coeffs(grid, xs, detach=True)
    wv = (
        jnp.tile(w[None], (B, 1, 1)) * jnp.asarray([1.0, 0.7, 1.3])[:, None, None]
    ).astype(jnp.float32)

    Lp, Bp = roots_stream_blocked_batched(
        cache.root, cache.inv_root, idx, wv, block=8,
        use_pallas=True, pallas_interpret=True,
    )
    Lx, Bx = jax.vmap(
        lambda Lb, Bb, wvb: roots_stream_blocked(
            Lb, Bb, idx, wvb, block=8, use_pallas=False
        )
    )(cache.root, cache.inv_root, wv)
    np.testing.assert_allclose(Lp, Lx, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(Bp, Bx, rtol=2e-4, atol=2e-4)


def test_blocked_chunk_two_level_recursion_parity():
    """The two-level (sub < k) factor recursion is exact: same real-number
    algebra as the flat recursion, fp reassociation only. (Measured slower
    on v5e — kept as an option; see pallas_blocked_chunk_batched.)"""
    from online_gp_tpu.ops.pallas_root_update import pallas_blocked_chunk_batched

    m, k, B = 96, 64, 2
    cache = _make_cache(jax.random.PRNGKey(21), m, B)
    S = jax.random.normal(jax.random.PRNGKey(22), (B, k, m), jnp.float32) * 0.3
    flat = pallas_blocked_chunk_batched(
        cache.root, cache.inv_root, S, interpret=True, sub=k
    )
    for sub in [16, 32]:
        two = pallas_blocked_chunk_batched(
            cache.root, cache.inv_root, S, interpret=True, sub=sub
        )
        np.testing.assert_allclose(two[0], flat[0], rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(two[1], flat[1], rtol=2e-5, atol=2e-5)


def test_blocked_chunk_coord_mode_parity():
    """The Gram-coordinate recursion (mode='coord') is exact vs the flat
    kernel, including degenerate (duplicate / zero-padding) rows.
    (Measured no faster on v5e — kept as the reference implementation of
    the sequential latency-floor analysis; see its docstring.)"""
    from online_gp_tpu.ops.pallas_root_update import pallas_blocked_chunk_batched

    m, k, B = 96, 64, 2
    cache = _make_cache(jax.random.PRNGKey(31), m, B)
    S = jax.random.normal(jax.random.PRNGKey(32), (B, k, m), jnp.float32) * 0.3
    S = S.at[:, 5].set(S[:, 2])  # duplicate row -> rank-deficient Gram
    S = S.at[:, 40].set(0.0)  # zero row -> exact no-op step
    flat = pallas_blocked_chunk_batched(
        cache.root, cache.inv_root, S, interpret=True, mode="flat"
    )
    coord = pallas_blocked_chunk_batched(
        cache.root, cache.inv_root, S, interpret=True, mode="coord"
    )
    np.testing.assert_allclose(coord[0], flat[0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(coord[1], flat[1], rtol=5e-4, atol=5e-4)
