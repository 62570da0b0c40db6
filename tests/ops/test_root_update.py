"""Direct unit tests for the maintained-root cache.

The reference never unit-tests ``UpdatedRootLazyTensor`` directly
(SURVEY.md §4 flags this gap); here root/inv-root consistency is asserted
after many rank-1 and rank-q updates against fresh factorizations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.ops.root_update import root_cache_init, root_cache_update, root_cache_expand


def _random_psd(key, m, rank, dtype=jnp.float64):
    v = jax.random.normal(key, (m, rank), dtype=dtype)
    return v @ v.T


def test_init_invariants():
    m = 24
    A = _random_psd(jax.random.PRNGKey(0), m, m)
    cache = root_cache_init(A, jitter=1e-10)
    np.testing.assert_allclose(np.asarray(cache.root @ cache.root.T), np.asarray(A), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(cache.root @ cache.inv_root.T), np.eye(m), atol=1e-8
    )


def test_rank1_update_chain():
    m = 16
    key = jax.random.PRNGKey(1)
    A = _random_psd(key, m, m)
    cache = root_cache_init(A, jitter=1e-12)
    A_ref = np.asarray(cache.root @ cache.root.T)  # includes the tiny init jitter
    for i in range(50):
        key, sub = jax.random.split(key)
        v = jax.random.normal(sub, (m, 1), dtype=jnp.float64)
        cache = root_cache_update(cache, v)
        A_ref = A_ref + np.asarray(v @ v.T)
    np.testing.assert_allclose(np.asarray(cache.root @ cache.root.T), A_ref, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(cache.root @ cache.inv_root.T), np.eye(m), atol=1e-7)
    # the dense mat tracks the exact (jitter-free) sum
    np.testing.assert_allclose(np.asarray(cache.mat), A_ref, atol=1e-6)


def test_rankq_update():
    m, q = 20, 4
    A = _random_psd(jax.random.PRNGKey(2), m, m)
    cache = root_cache_init(A, jitter=1e-12)
    v = jax.random.normal(jax.random.PRNGKey(3), (m, q), dtype=jnp.float64)
    updated = root_cache_update(cache, v)
    target = np.asarray(cache.root @ cache.root.T + v @ v.T)
    np.testing.assert_allclose(np.asarray(updated.root @ updated.root.T), target, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(updated.root @ updated.inv_root.T), np.eye(m), atol=1e-8)


def test_degenerate_update_is_noop_direction():
    m = 12
    A = _random_psd(jax.random.PRNGKey(4), m, m)
    cache = root_cache_init(A, jitter=1e-12)
    v = jnp.zeros((m, 1), dtype=jnp.float64)
    updated = root_cache_update(cache, v)
    np.testing.assert_allclose(np.asarray(updated.root), np.asarray(cache.root), atol=1e-12)
    np.testing.assert_allclose(np.asarray(updated.inv_root), np.asarray(cache.inv_root), atol=1e-12)


def test_batched_and_expanded():
    m = 10
    A = jnp.stack([_random_psd(jax.random.PRNGKey(5), m, m), _random_psd(jax.random.PRNGKey(6), m, m)])
    cache = root_cache_init(A, jitter=1e-12)
    v = jax.random.normal(jax.random.PRNGKey(7), (2, m, 1), dtype=jnp.float64)
    updated = root_cache_update(cache, v)
    assert updated.root.shape == (2, m, m)
    target = np.asarray(cache.mat + jnp.einsum("bmq,bnq->bmn", v, v))
    np.testing.assert_allclose(np.asarray(updated.mat), target, atol=1e-10)

    expanded = root_cache_expand(cache, (3,))
    assert expanded.root.shape == (3, 2, m, m)


def test_update_in_float32_stays_stable():
    # TPU-realistic precision: invariants should hold loosely after 200 updates.
    m = 36
    A = _random_psd(jax.random.PRNGKey(8), m, m, dtype=jnp.float32)
    cache = root_cache_init(A.astype(jnp.float32), jitter=1e-4)
    key = jax.random.PRNGKey(9)

    def step(c, k):
        v = jax.random.normal(k, (m, 1), dtype=jnp.float32) * 0.3
        return root_cache_update(c, v), None

    keys = jax.random.split(key, 200)
    cache, _ = jax.lax.scan(step, cache, keys)
    recon = np.asarray(cache.root @ cache.root.T)
    ident = np.asarray(cache.root @ cache.inv_root.T)
    rel = np.abs(recon - np.asarray(cache.mat)).max() / np.abs(np.asarray(cache.mat)).max()
    assert rel < 5e-3
    assert np.abs(ident - np.eye(m)).max() < 5e-2


def test_slim_cache_matches_full():
    """Slim mode (mat=None) must evolve identical roots to the full cache,
    refuse nothing, and rebuild A = L L^T on demand."""
    from online_gp_tpu.ops.root_update import root_cache_slim, root_cache_rebuild_mat

    m = 18
    A = _random_psd(jax.random.PRNGKey(10), m, m)
    full = root_cache_init(A, jitter=1e-12)
    slim = root_cache_slim(full)
    assert slim.mat is None
    for i in range(20):
        v = jax.random.normal(jax.random.PRNGKey(100 + i), (m, 1), dtype=jnp.float64)
        full = root_cache_update(full, v)
        slim = root_cache_update(slim, v)
        assert slim.mat is None
    np.testing.assert_allclose(np.asarray(slim.root), np.asarray(full.root), atol=1e-12)
    np.testing.assert_allclose(np.asarray(slim.inv_root), np.asarray(full.inv_root), atol=1e-12)

    rebuilt = root_cache_rebuild_mat(slim)
    np.testing.assert_allclose(np.asarray(rebuilt.mat), np.asarray(full.mat), rtol=1e-8, atol=1e-8)

    # expand handles the None leaf
    expanded = root_cache_expand(slim, (3,))
    assert expanded.mat is None and expanded.root.shape == (3, m, m)


def test_blocked_stream_matches_sequential():
    """roots_stream_blocked must equal the n-step rank-1 recursion for any
    block size, including non-divisible n (zero-weight padding no-ops) and
    a zero-weight point mid-stream."""
    from online_gp_tpu.ops.root_update import roots_apply_rank1_p, roots_stream_blocked

    rng = np.random.RandomState(0)
    m, P, n = 30, 4, 37
    A = _random_psd(jax.random.PRNGKey(5), m, 2 * m)
    cache = root_cache_init(A, jitter=1e-10)
    L0, B0 = cache.root, cache.inv_root
    idx = jnp.asarray(rng.randint(0, m, (n, P)), jnp.int32)
    wv = jnp.asarray(rng.randn(n, P))
    wv = wv.at[5].set(0.0)  # degenerate point: must be an exact no-op

    Ls, Bs = L0, B0
    for t in range(n):
        v = jnp.zeros((m,)).at[idx[t]].add(wv[t])
        Ls, Bs = roots_apply_rank1_p(Ls, Bs, Bs.T @ v)

    for k in (1, 2, 8, 32, 64):
        Lb, Bb = roots_stream_blocked(L0, B0, idx, wv, block=k)
        np.testing.assert_allclose(np.asarray(Lb), np.asarray(Ls), atol=1e-11)
        np.testing.assert_allclose(np.asarray(Bb), np.asarray(Bs), atol=1e-11)


def test_blocked_stream_pallas_chunk_interpret():
    """The fused Pallas chunk kernel (interpret mode on CPU) must match
    the sequential rank-1 recursion through roots_stream_blocked (f32)."""
    from online_gp_tpu.ops.root_update import roots_apply_rank1_p, roots_stream_blocked

    rng = np.random.RandomState(2)
    m, P, n = 20, 4, 21
    A = jnp.asarray(
        (lambda a: a @ a.T / m)(rng.randn(m, 2 * m)).astype(np.float32)
    )
    cache = root_cache_init(A, jitter=1e-6)
    L0, B0 = cache.root, cache.inv_root
    idx = jnp.asarray(rng.randint(0, m, (n, P)), jnp.int32)
    wv = jnp.asarray(rng.randn(n, P).astype(np.float32))

    Ls, Bs = L0, B0
    for t in range(n):
        v = jnp.zeros((m,), jnp.float32).at[idx[t]].add(wv[t])
        Ls, Bs = roots_apply_rank1_p(Ls, Bs, Bs.T @ v)

    for k in (4, 16):
        Lp, Bp = roots_stream_blocked(
            L0, B0, idx, wv, block=k, use_pallas=True, pallas_interpret=True
        )
        np.testing.assert_allclose(np.asarray(Lp), np.asarray(Ls), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(Bp), np.asarray(Bs), rtol=1e-4, atol=1e-5)


def test_blocked_stream_pallas_multitile_ragged_m():
    """Interpret-mode parity at m=130: exercises the chunk kernel's
    multi-tile apply stage with a ragged final row tile (tile=128), which
    the tiny single-tile case cannot reach."""
    from online_gp_tpu.ops.root_update import roots_apply_rank1_p, roots_stream_blocked

    rng = np.random.RandomState(3)
    m, P, n = 130, 4, 10
    A = jnp.asarray((lambda a: a @ a.T / m)(rng.randn(m, 2 * m)).astype(np.float32))
    cache = root_cache_init(A, jitter=1e-6)
    L0, B0 = cache.root, cache.inv_root
    idx = jnp.asarray(rng.randint(0, m, (n, P)), jnp.int32)
    wv = jnp.asarray(rng.randn(n, P).astype(np.float32))

    Ls, Bs = L0, B0
    for t in range(n):
        v = jnp.zeros((m,), jnp.float32).at[idx[t]].add(wv[t])
        Ls, Bs = roots_apply_rank1_p(Ls, Bs, Bs.T @ v)

    Lp, Bp = roots_stream_blocked(
        L0, B0, idx, wv, block=5, use_pallas=True, pallas_interpret=True
    )
    np.testing.assert_allclose(np.asarray(Lp), np.asarray(Ls), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Bp), np.asarray(Bs), rtol=1e-4, atol=1e-5)


def test_blocked_stream_f64_pallas_rejected():
    """Forcing the f32-only fused kernel with f64 inputs must fail loudly."""
    import pytest
    from online_gp_tpu.ops.root_update import roots_stream_blocked

    m = 8
    L = jnp.eye(m, dtype=jnp.float64)
    idx = jnp.zeros((4, 2), jnp.int32)
    wv = jnp.ones((4, 2), jnp.float64)
    with pytest.raises(TypeError, match="float32-only"):
        roots_stream_blocked(L, L, idx, wv, use_pallas=True, pallas_interpret=True)
