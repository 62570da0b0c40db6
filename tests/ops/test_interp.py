import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.interp import interp_coeffs, interp_matvec, dense_w, gather_predict, wt_matvec


def test_weights_sum_to_one():
    grid = Grid.create([(-1.0, 1.0), (-1.0, 1.0)], 12, dtype=jnp.float64)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (50, 2), minval=-1.0, maxval=1.0, dtype=jnp.float64)
    idx, w = interp_coeffs(grid, x)
    assert idx.shape == (50, 16)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0, atol=1e-12)
    assert int(idx.min()) >= 0 and int(idx.max()) < grid.num_points


def test_cubic_interp_accuracy():
    # Keys cubic convolution is 3rd-order accurate for smooth functions.
    grid = Grid.create([(-1.0, 1.0)], 64, dtype=jnp.float64)
    f = lambda x: jnp.sin(3.0 * x) + 0.5 * x**2
    grid_vals = f(grid.points_1d(0))[:, None]
    x = jnp.linspace(-0.95, 0.95, 101, dtype=jnp.float64)[:, None]
    idx, w = interp_coeffs(grid, x)
    approx = interp_matvec(idx, w, grid_vals)[:, 0]
    np.testing.assert_allclose(np.asarray(approx), np.asarray(f(x[:, 0])), atol=5e-5)


def test_interp_exact_on_grid_points():
    grid = Grid.create([(-1.0, 1.0), (0.0, 2.0)], (10, 9), dtype=jnp.float64)
    pts = grid.full_points()
    vals = jnp.arange(grid.num_points, dtype=jnp.float64)[:, None]
    idx, w = interp_coeffs(grid, pts)
    approx = interp_matvec(idx, w, vals)[:, 0]
    np.testing.assert_allclose(np.asarray(approx), np.asarray(vals[:, 0]), atol=1e-9)


def test_dense_w_matches_matvec():
    grid = Grid.create([(-1.0, 1.0), (-1.0, 1.0)], 8, dtype=jnp.float64)
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (17, 2), minval=-1.0, maxval=1.0, dtype=jnp.float64)
    cache = jax.random.normal(jax.random.PRNGKey(2), (grid.num_points, 3), dtype=jnp.float64)
    idx, w = interp_coeffs(grid, x)
    W = dense_w(idx, w, grid.num_points)  # (m, n)
    np.testing.assert_allclose(
        np.asarray(W.T @ cache), np.asarray(interp_matvec(idx, w, cache)), atol=1e-12
    )


def test_wt_matvec_scatter():
    grid = Grid.create([(-1.0, 1.0)], 16, dtype=jnp.float64)
    x = jnp.linspace(-0.9, 0.9, 7, dtype=jnp.float64)[:, None]
    v = jax.random.normal(jax.random.PRNGKey(3), (7, 2), dtype=jnp.float64)
    idx, w = interp_coeffs(grid, x)
    W = dense_w(idx, w, grid.num_points)
    np.testing.assert_allclose(
        np.asarray(W @ v), np.asarray(wt_matvec(idx, w, v, grid.num_points)), atol=1e-12
    )


def test_gather_predict_matches_dense():
    grid = Grid.create([(-1.0, 1.0), (-1.0, 1.0)], 7, dtype=jnp.float64)
    m = grid.num_points
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (9, 2), minval=-1.0, maxval=1.0, dtype=jnp.float64)
    mean_cache = jax.random.normal(jax.random.PRNGKey(5), (2, m, 1), dtype=jnp.float64)
    A = jax.random.normal(jax.random.PRNGKey(6), (2, m, m), dtype=jnp.float64)
    cov_cache = A @ A.swapaxes(-1, -2)
    idx, w = interp_coeffs(grid, x)
    mean, var = gather_predict(idx, w, mean_cache, cov_cache)
    W = dense_w(idx, w, m).T  # (n, m)
    ref_mean = jnp.einsum("nm,bmk->bn", W, mean_cache[..., :])
    ref_var = jnp.einsum("nm,bmk,nk->bn", W, cov_cache, W)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var), atol=1e-9)
