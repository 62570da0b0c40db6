"""Spectral Mixture kernel: formula parity, sum-of-Kronecker grid
assembly, Toeplitz-MVM parity, and a WISKI end-to-end run (the reference
notebook's covar_module, ``regression_viz_1D.ipynb``)."""

import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels import (
    SpectralMixtureKernel,
    grid_kuu_dense,
    grid_kuu_mvm,
    sm_init_from_data,
)
from online_gp_tpu.ops.grid import Grid

DT = jnp.float64


def _kernel_and_params(Q=3, D=2, batch=()):
    k = SpectralMixtureKernel(Q)
    params = k.init_params(D, batch_shape=batch, dtype=DT)
    return k, params


def _brute_force(params, x1, x2):
    w = np.exp(np.asarray(params["raw_sm_weights"]))
    mu = np.exp(np.asarray(params["raw_sm_means"]))
    sc = np.exp(np.asarray(params["raw_sm_scales"]))
    out = np.zeros((x1.shape[0], x2.shape[0]))
    for i, a in enumerate(np.asarray(x1)):
        for j, b in enumerate(np.asarray(x2)):
            tau = a - b
            for q in range(w.shape[0]):
                comp = np.prod(
                    np.exp(-2 * math.pi**2 * tau**2 * sc[q] ** 2)
                    * np.cos(2 * math.pi * tau * mu[q])
                )
                out[i, j] += w[q] * comp
    return out


def test_matrix_matches_brute_force():
    k, params = _kernel_and_params()
    x1 = jax.random.uniform(jax.random.PRNGKey(0), (5, 2), DT, -1, 1)
    x2 = jax.random.uniform(jax.random.PRNGKey(1), (4, 2), DT, -1, 1)
    K = k.matrix(params, x1, x2)
    np.testing.assert_allclose(np.asarray(K), _brute_force(params, x1, x2), rtol=1e-10, atol=1e-12)


def test_matrix_psd_and_stationary():
    k, params = _kernel_and_params(Q=2, D=1)
    x = jnp.linspace(-1, 1, 20, dtype=DT)[:, None]
    K = np.asarray(k.matrix(params, x, x))
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    evals = np.linalg.eigvalsh(K)
    assert evals.min() > -1e-8
    # k(0) = sum of weights on the diagonal
    np.testing.assert_allclose(
        np.diag(K), np.sum(np.exp(np.asarray(params["raw_sm_weights"]))), rtol=1e-10
    )


def test_grid_dense_matches_matrix():
    """Sum-of-Kronecker assembly equals the dense kernel on grid points."""
    k, params = _kernel_and_params(Q=3, D=2)
    grid = Grid.create([(-1.0, 1.0), (-0.5, 0.8)], 7, dtype=DT)
    Kuu = grid_kuu_dense(k, params, grid)
    pts = grid.full_points()
    K_ref = k.matrix(params, pts, pts)
    np.testing.assert_allclose(np.asarray(Kuu), np.asarray(K_ref), rtol=1e-9, atol=1e-11)


def test_grid_mvm_toeplitz_parity():
    k, params = _kernel_and_params(Q=2, D=2)
    grid = Grid.create([(-1.0, 1.0)] * 2, 8, dtype=DT)
    m = grid.num_points
    x = jax.random.normal(jax.random.PRNGKey(2), (m, 3), DT)
    dense = grid_kuu_dense(k, params, grid) @ x
    fft = grid_kuu_mvm(k, params, grid, x, use_toeplitz=True)
    kron = grid_kuu_mvm(k, params, grid, x, use_toeplitz=False)
    np.testing.assert_allclose(np.asarray(fft), np.asarray(dense), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.asarray(kron), np.asarray(dense), rtol=1e-8, atol=1e-9)


def test_batched_params_broadcast():
    k, params = _kernel_and_params(Q=2, D=1, batch=(3,))
    grid = Grid.create([(-1.0, 1.0)], 6, dtype=DT)
    Kuu = grid_kuu_dense(k, params, grid)
    assert Kuu.shape == (3, 6, 6)


@pytest.mark.slow
def test_wiski_end_to_end_multi_frequency():
    """WISKI + SM kernel fits a two-frequency signal an RBF of the same
    budget struggles with — the notebook's use case."""
    from online_gp_tpu.kernels import RBFKernel
    from online_gp_tpu.models.wiski import WiskiModel, wiski_init, wiski_mll, wiski_predict
    import optax

    key = jax.random.PRNGKey(0)
    x = jnp.sort(jax.random.uniform(key, (160, 1), DT, -1, 1), axis=0)
    f = lambda t: jnp.sin(2 * math.pi * 2.0 * t) + 0.5 * jnp.sin(2 * math.pi * 5.0 * t)
    y = f(x) + 0.05 * jax.random.normal(jax.random.fold_in(key, 1), x.shape, DT)

    grid = Grid.create([(-1.1, 1.1)], 64, dtype=DT)
    xt = jnp.linspace(-0.95, 0.95, 128, dtype=DT)[:, None]

    def run(kernel, params):
        model = WiskiModel(kernel, grid, num_outputs=1, learn_additional_noise=True)
        p = {"kernel": params, "raw_second_noise": jnp.zeros((1,), DT)}
        state = wiski_init(model, x, y, jnp.full_like(y, 0.05))
        opt = optax.adam(0.03)

        @jax.jit
        def fit(p, os_):
            def step(carry, _):
                pp, oo = carry
                loss, g = jax.value_and_grad(lambda z: -jnp.sum(wiski_mll(model, z, state)))(pp)
                up, oo = opt.update(g, oo, pp)
                return (optax.apply_updates(pp, up), oo), loss

            (p, _), losses = jax.lax.scan(step, (p, os_), None, length=250)
            return p, losses

        p, losses = fit(p, opt.init(p))
        mean, _ = wiski_predict(model, p, state, xt)
        rmse = float(jnp.sqrt(jnp.mean((mean[0] - f(xt)[:, 0]) ** 2)))
        return rmse, float(losses[-1])

    sm = SpectralMixtureKernel(3)
    sm_params = sm_init_from_data(sm, x, y, jax.random.PRNGKey(7))
    sm_params = {k_: v.astype(DT) for k_, v in sm_params.items()}
    rmse_sm, loss_sm = run(sm, sm_params)
    assert np.isfinite(loss_sm)
    assert rmse_sm < 0.15, f"SM-WISKI failed to fit the two-frequency signal: {rmse_sm}"
