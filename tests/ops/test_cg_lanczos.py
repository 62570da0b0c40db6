import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.ops.cg import batched_cg, lanczos, lanczos_root, slq_logdet


def _psd(key, m, cond=100.0, dtype=jnp.float64):
    v = jax.random.normal(key, (m, m), dtype=dtype)
    q, _ = jnp.linalg.qr(v)
    evals = jnp.logspace(0, jnp.log10(cond), m, dtype=dtype)
    return (q * evals) @ q.T


def test_cg_solves():
    A = _psd(jax.random.PRNGKey(0), 40)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (40, 3), dtype=jnp.float64)
    x = batched_cg(lambda v: A @ v, rhs, max_iters=120, tol=1e-10)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(rhs), rtol=1e-6, atol=1e-6)


def test_cg_batched():
    A1 = _psd(jax.random.PRNGKey(2), 20)
    A2 = _psd(jax.random.PRNGKey(3), 20)
    A = jnp.stack([A1, A2])
    rhs = jax.random.normal(jax.random.PRNGKey(4), (2, 20, 2), dtype=jnp.float64)
    x = batched_cg(lambda v: A @ v, rhs, max_iters=80, tol=1e-10)
    np.testing.assert_allclose(np.asarray(A @ x), np.asarray(rhs), rtol=1e-6, atol=1e-6)


def test_lanczos_tridiagonalizes():
    m = 30
    A = _psd(jax.random.PRNGKey(5), m, cond=50.0)
    v0 = jax.random.normal(jax.random.PRNGKey(6), (m,), dtype=jnp.float64)
    Q, alphas, betas = lanczos(lambda v: A @ v, v0, m)
    # orthonormality + eigenvalue reproduction at full k
    np.testing.assert_allclose(np.asarray(Q @ Q.T), np.eye(m), atol=1e-8)
    T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvalsh(np.asarray(T))), np.sort(np.linalg.eigvalsh(np.asarray(A))), rtol=1e-6
    )


def test_lanczos_root_lowrank():
    m = 40
    # effectively low-rank matrix: Lanczos rank 12 should capture it
    v = jax.random.normal(jax.random.PRNGKey(7), (m, 8), dtype=jnp.float64)
    A = v @ v.T + 1e-8 * jnp.eye(m, dtype=jnp.float64)
    v0 = jax.random.normal(jax.random.PRNGKey(8), (m,), dtype=jnp.float64)
    R = lanczos_root(lambda x: A @ x, v0, 12)
    rel = float(jnp.linalg.norm(R @ R.T - A) / jnp.linalg.norm(A))
    assert rel < 1e-4


def test_slq_logdet():
    m = 60
    A = _psd(jax.random.PRNGKey(9), m, cond=30.0)
    est = float(slq_logdet(lambda v: A @ v, m, jax.random.PRNGKey(10), num_probes=30, num_iters=40, dtype=jnp.float64))
    exact = float(jnp.linalg.slogdet(A)[1])
    assert abs(est - exact) / abs(exact) < 0.05


def test_lanczos_root_past_operator_rank_truncates_cleanly():
    """Asking for a rank-k root of a rank-r < k operator must zero-truncate
    at the Krylov breakdown instead of producing NaNs (hit by low-rank
    WISKI inits with rank > n, e.g. the large-grid classifier)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from online_gp_tpu.ops.cg import lanczos_root

    m, r, k = 60, 12, 40  # k well past rank(A) = r
    key = jax.random.PRNGKey(0)
    V = jax.random.normal(key, (m, r))
    A = V @ V.T  # PSD, rank r

    R = lanczos_root(lambda v: A @ v, jax.random.normal(jax.random.PRNGKey(1), (m,)), k)
    assert bool(jnp.isfinite(R).all()), "breakdown produced non-finite root"
    # with full reorthogonalization the rank-r operator is recovered exactly
    np.testing.assert_allclose(np.asarray(R @ R.T), np.asarray(A), rtol=1e-4, atol=1e-3)
