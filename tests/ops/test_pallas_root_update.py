"""Numerical parity of the fused Pallas rank-1 root update vs the XLA path.

The Pallas kernel is auto-selected on the TPU point-streaming hot path
(``models/wiski.py`` wiski_condition), so its numerics must match
:func:`online_gp_tpu.ops.root_update.root_cache_update` exactly — these
tests run the kernel in Pallas interpret mode on CPU (same program, no
TPU required), covering non-128-divisible m (edge-tile masking), repeated
sequential updates, the batched multi-output unroll, and the maintained
root invariants. Mirrors the reference's parity-test discipline
(``/root/reference/tests/mlls/test_batched_woodbury_marginal_log_likelihood.py:55-82``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.ops.root_update import RootCache, root_cache_init, root_cache_update
from online_gp_tpu.ops.pallas_root_update import (
    pallas_rank1_update,
    pallas_root_cache_update,
)


def _make_cache(key, m, batch=None):
    """A well-conditioned PSD Gram accumulator with exact maintained roots."""
    shape = (m, m) if batch is None else (batch, m, m)
    W = jax.random.normal(key, shape[:-1] + (m,), dtype=jnp.float32)
    A = (jnp.einsum("...ik,...jk->...ij", W, W) / m + jnp.eye(m)).astype(jnp.float32)
    cache = root_cache_init(A)
    return RootCache(*(x.astype(jnp.float32) for x in cache))


@pytest.mark.parametrize("m", [128, 100, 140, 257])
def test_rank1_parity_single(m):
    key = jax.random.PRNGKey(m)
    cache = _make_cache(key, m)
    v = jax.random.normal(jax.random.PRNGKey(m + 1), (m, 1), dtype=jnp.float32)

    Lp, Bp, Ap = pallas_rank1_update(
        cache.root, cache.inv_root, cache.mat, v, interpret=True
    )
    ref = root_cache_update(cache, v)

    np.testing.assert_allclose(Ap, ref.mat, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Lp, ref.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(Bp, ref.inv_root, rtol=1e-5, atol=1e-5)


def test_rank1_parity_zero_vector():
    """s == 0 guard: a zero update vector must be a no-op, not NaN."""
    m = 96
    cache = _make_cache(jax.random.PRNGKey(0), m)
    v = jnp.zeros((m, 1), jnp.float32)
    Lp, Bp, Ap = pallas_rank1_update(
        cache.root, cache.inv_root, cache.mat, v, interpret=True
    )
    np.testing.assert_allclose(Lp, cache.root, atol=1e-7)
    np.testing.assert_allclose(Bp, cache.inv_root, atol=1e-7)
    np.testing.assert_allclose(Ap, cache.mat, atol=1e-7)


def test_sequential_updates_track_xla():
    """8 sequential rank-1 updates: Pallas and XLA streams stay together
    and both preserve the root invariants."""
    m = 130  # forces a 2-row edge tile at tile=128
    key = jax.random.PRNGKey(3)
    cache_p = _make_cache(key, m)
    cache_x = cache_p

    for i in range(8):
        v = jax.random.normal(jax.random.PRNGKey(10 + i), (m, 1), jnp.float32) * 0.5
        Lp, Bp, Ap = pallas_rank1_update(
            cache_p.root, cache_p.inv_root, cache_p.mat, v, interpret=True
        )
        cache_p = RootCache(mat=Ap, root=Lp, inv_root=Bp)
        cache_x = root_cache_update(cache_x, v)

    np.testing.assert_allclose(cache_p.root, cache_x.root, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(cache_p.inv_root, cache_x.inv_root, rtol=2e-4, atol=2e-4)

    # invariants: L L^T == A (+ init jitter), B^T L == I
    recon = cache_p.root @ cache_p.root.T
    np.testing.assert_allclose(recon, cache_p.mat, rtol=5e-4, atol=5e-3)
    ident = cache_p.inv_root.T @ cache_p.root
    np.testing.assert_allclose(ident, np.eye(m), atol=5e-4)


def test_batched_cache_update_parity():
    """The multi-output unroll in pallas_root_cache_update (B=3, q=1)."""
    m, B = 64, 3
    cache = _make_cache(jax.random.PRNGKey(7), m, batch=B)
    v = jax.random.normal(jax.random.PRNGKey(8), (B, m, 1), jnp.float32)

    out_p = pallas_root_cache_update(cache, v, interpret=True)
    out_x = root_cache_update(cache, v)

    np.testing.assert_allclose(out_p.mat, out_x.mat, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_p.root, out_x.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_p.inv_root, out_x.inv_root, rtol=1e-5, atol=1e-5)


def test_fallback_shapes_route_to_xla():
    """Shapes outside the kernel contract (q>1) must fall back, not crash."""
    m = 32
    cache = _make_cache(jax.random.PRNGKey(9), m, batch=1)
    v = jax.random.normal(jax.random.PRNGKey(10), (1, m, 2), jnp.float32)
    out = pallas_root_cache_update(cache, v, interpret=True)
    ref = root_cache_update(cache, v)
    np.testing.assert_allclose(out.root, ref.root, rtol=1e-5, atol=1e-5)


def test_slim_kernel_parity():
    """The roots-only slim kernel (no Gram accumulator) matches both the
    full kernel's roots and the XLA slim path, incl. edge tiles."""
    from online_gp_tpu.ops.pallas_root_update import pallas_rank1_update_slim
    from online_gp_tpu.ops.root_update import root_cache_slim

    for m in (128, 100, 130):
        cache = _make_cache(jax.random.PRNGKey(m), m)
        v = jax.random.normal(jax.random.PRNGKey(m + 1), (m, 1), dtype=jnp.float32)
        Lp, Bp = pallas_rank1_update_slim(cache.root, cache.inv_root, v, interpret=True)
        ref = root_cache_update(root_cache_slim(cache), v)
        np.testing.assert_allclose(Lp, ref.root, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(Bp, ref.inv_root, rtol=1e-5, atol=1e-5)


def test_slim_cache_update_dispatch():
    """pallas_root_cache_update routes slim caches to the slim kernel and
    keeps mat=None through the batched unroll."""
    from online_gp_tpu.ops.root_update import root_cache_slim

    m, B = 64, 2
    cache = root_cache_slim(_make_cache(jax.random.PRNGKey(77), m, batch=B))
    v = jax.random.normal(jax.random.PRNGKey(78), (B, m, 1), jnp.float32)
    out_p = pallas_root_cache_update(cache, v, interpret=True)
    out_x = root_cache_update(cache, v)
    assert out_p.mat is None
    np.testing.assert_allclose(out_p.root, out_x.root, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_p.inv_root, out_x.inv_root, rtol=1e-5, atol=1e-5)
