import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.ops.toeplitz import toeplitz_mvm, sym_toeplitz_dense
from online_gp_tpu.ops.kron import kron_mvm, kron_dense
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, chol_logdet
from online_gp_tpu.kernels.base import RBFKernel, MaternKernel
from online_gp_tpu.kernels.grid_kernel import grid_kuu_dense, grid_kuu_mvm
from online_gp_tpu.ops.grid import Grid


def test_toeplitz_mvm_matches_dense():
    col = jnp.exp(-0.5 * jnp.arange(17, dtype=jnp.float64) ** 2 / 9.0)
    T = sym_toeplitz_dense(col)
    x = jax.random.normal(jax.random.PRNGKey(0), (17, 3), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(toeplitz_mvm(col, x)), np.asarray(T @ x), atol=1e-10)


def test_kron_ops_match_numpy():
    a = jax.random.normal(jax.random.PRNGKey(1), (4, 4), dtype=jnp.float64)
    b = jax.random.normal(jax.random.PRNGKey(2), (5, 5), dtype=jnp.float64)
    c = jax.random.normal(jax.random.PRNGKey(3), (3, 3), dtype=jnp.float64)
    dense = np.kron(np.kron(np.asarray(a), np.asarray(b)), np.asarray(c))
    np.testing.assert_allclose(np.asarray(kron_dense([a, b, c])), dense, atol=1e-12)
    x = jax.random.normal(jax.random.PRNGKey(4), (4 * 5 * 3, 2), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(kron_mvm([a, b, c], x)), dense @ np.asarray(x), atol=1e-10)


def test_grid_kuu_dense_matches_pairwise():
    grid = Grid.create([(-1.0, 1.0), (0.0, 2.0)], (7, 6), dtype=jnp.float64)
    for kernel in (RBFKernel(), MaternKernel(1.5)):
        params = kernel.init_params(2, (1,), lengthscale=0.7, outputscale=1.3, dtype=jnp.float64)
        Kuu = grid_kuu_dense(kernel, params, grid)[0]
        pts = grid.full_points()
        K_ref = kernel.matrix(params, pts, pts)[0]
        np.testing.assert_allclose(np.asarray(Kuu), np.asarray(K_ref), atol=1e-10)


def test_grid_kuu_mvm_paths_agree():
    grid = Grid.create([(-1.0, 1.0), (0.0, 2.0)], (7, 6), dtype=jnp.float64)
    kernel = RBFKernel()
    params = kernel.init_params(2, (), lengthscale=0.5, outputscale=2.0, dtype=jnp.float64)
    x = jax.random.normal(jax.random.PRNGKey(5), (grid.num_points, 3), dtype=jnp.float64)
    dense = grid_kuu_dense(kernel, params, grid) @ x
    np.testing.assert_allclose(
        np.asarray(grid_kuu_mvm(kernel, params, grid, x, use_toeplitz=False)), np.asarray(dense), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(grid_kuu_mvm(kernel, params, grid, x, use_toeplitz=True)), np.asarray(dense), atol=1e-8
    )


def test_psd_safe_cholesky_escalates():
    # A singular matrix: plain Cholesky fails, jitter escalation succeeds.
    v = jax.random.normal(jax.random.PRNGKey(6), (12, 3), dtype=jnp.float64)
    A = v @ v.T
    L = psd_safe_cholesky(A, jitter=1e-8, tries=5)
    assert bool(jnp.isfinite(L).all())
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A), atol=1e-4)


def test_cho_solve_and_logdet():
    v = jax.random.normal(jax.random.PRNGKey(7), (9, 9), dtype=jnp.float64)
    A = v @ v.T + 9 * jnp.eye(9, dtype=jnp.float64)
    L = psd_safe_cholesky(A, jitter=0.0)
    rhs = jax.random.normal(jax.random.PRNGKey(8), (9, 2), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(A @ cho_solve(L, rhs)), np.asarray(rhs), atol=1e-8)
    np.testing.assert_allclose(float(chol_logdet(L)), float(jnp.linalg.slogdet(A)[1]), atol=1e-9)
