"""Exact-parity oracle tests: WISKI caches vs a dense exact GP.

Port of the reference's core correctness strategy (SURVEY.md §4): the
Woodbury-from-caches MLL, its hyperparameter gradients, and the cached
posterior must match a from-scratch dense GP over the *same* SKI kernel
(W K_uu W' + D), in float64, including over interleaved
observe -> train -> observe sequences
(reference ``tests/mlls/test_batched_woodbury_marginal_log_likelihood.py``
and the canonical ``tests/models/test_woodbury_gp_model.py`` pattern).
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_mll,
    wiski_predict,
    wiski_predict_root,
)
from online_gp_tpu.models.exact import ski_kernel_matrix, exact_mll, exact_posterior

DT = jnp.float64
CFG = SolverConfig()


def _setup(B=1, n=20, d=2, grid_size=8, seed=0, learn_noise=False):
    key = jax.random.PRNGKey(seed)
    kx, ky, kn = jax.random.split(key, 3)
    x = jax.random.uniform(kx, (n, d), minval=-1.0, maxval=1.0, dtype=DT)
    y = jax.random.normal(ky, (n, B), dtype=DT)
    noise = 0.5 + jax.random.uniform(kn, (n, B), dtype=DT)
    grid = Grid.create([(-1.0, 1.0)] * d, grid_size, dtype=DT)
    model = WiskiModel(RBFKernel(), grid, num_outputs=B, learn_additional_noise=learn_noise)
    params = model.init_params(d, dtype=DT, lengthscale=0.6, outputscale=1.2)
    return model, params, x, y, noise


def _oracle_mll(model, params, x, y, noise):
    """Dense exact MLL per output over the SKI kernel, normalized by n."""
    out = []
    B = model.num_outputs
    s2 = jnp.exp(params["raw_second_noise"]) if model.learn_additional_noise else jnp.ones(B, DT)
    for b in range(B):
        kb = {k: v[b] for k, v in params["kernel"].items()}
        K = ski_kernel_matrix(model.kernel, kb, model.grid, x)
        out.append(exact_mll(K, y[:, b], s2[b] * noise[:, b]))
    return jnp.stack(out)


@pytest.mark.parametrize("B", [1, 3])
@pytest.mark.slow
def test_mll_value_parity(B):
    model, params, x, y, noise = _setup(B=B)
    state = wiski_init(model, x, y, noise, root_jitter=1e-12)
    got = wiski_mll(model, params, state, CFG)
    want = _oracle_mll(model, params, x, y, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("learn_noise", [False, True])
@pytest.mark.slow
def test_mll_grad_parity(learn_noise):
    model, params, x, y, noise = _setup(B=2, learn_noise=learn_noise)
    state = wiski_init(model, x, y, noise, root_jitter=1e-12)

    def loss_wiski(p):
        return -jnp.sum(wiski_mll(model, p, state, CFG))

    def loss_oracle(p):
        return -jnp.sum(_oracle_mll(model, p, x, y, noise))

    gw = jax.grad(loss_wiski)(params)
    go = jax.grad(loss_oracle)(params)
    flat_w, _ = jax.flatten_util.ravel_pytree(gw)
    flat_o, _ = jax.flatten_util.ravel_pytree(go)
    np.testing.assert_allclose(np.asarray(flat_w), np.asarray(flat_o), rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_posterior_parity():
    model, params, x, y, noise = _setup(B=2, n=25)
    state = wiski_init(model, x, y, noise, root_jitter=1e-12)
    xt = jax.random.uniform(jax.random.PRNGKey(42), (13, 2), minval=-0.9, maxval=0.9, dtype=DT)
    mean, var = wiski_predict(model, params, state, xt, CFG)

    for b in range(2):
        kb = {k: v[b] for k, v in params["kernel"].items()}
        K_train = ski_kernel_matrix(model.kernel, kb, model.grid, x)
        K_cross = ski_kernel_matrix(model.kernel, kb, model.grid, xt, x)
        K_test = ski_kernel_matrix(model.kernel, kb, model.grid, xt)
        m_ref, v_ref = exact_posterior(
            K_train, K_cross, jnp.diagonal(K_test), y[:, b], noise[:, b], jitter=0.0
        )
        np.testing.assert_allclose(np.asarray(mean[b]), np.asarray(m_ref), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var[b]), np.asarray(v_ref), rtol=1e-5, atol=1e-8)


@pytest.mark.slow
def test_posterior_root_consistency():
    model, params, x, y, noise = _setup(B=1, n=15)
    state = wiski_init(model, x, y, noise, root_jitter=1e-12)
    xt = jax.random.uniform(jax.random.PRNGKey(7), (6, 2), minval=-0.9, maxval=0.9, dtype=DT)
    mean, var = wiski_predict(model, params, state, xt, CFG)
    mean_r, root = wiski_predict_root(model, params, state, xt, CFG)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_r), atol=1e-10)
    var_from_root = jnp.sum(root**2, axis=-1)
    np.testing.assert_allclose(np.asarray(var_from_root), np.asarray(var), rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_interleaved_observe_train_observe():
    """Condition point-by-point; MLL and posterior must track an oracle
    rebuilt from the concatenated data at every step (the stale-but-
    canonical reference test's observe_and_update pattern)."""
    model, params, x, y, noise = _setup(B=1, n=12, seed=3)
    state = wiski_init(model, x[:6], y[:6], noise[:6], root_jitter=1e-12)

    for t in range(6, 12):
        state = wiski_condition(model, state, x[t : t + 1], y[t : t + 1], noise[t : t + 1])
        got = wiski_mll(model, params, state, CFG)
        want = _oracle_mll(model, params, x[: t + 1], y[: t + 1], noise[: t + 1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-7, atol=1e-7)

        # hyper "training" step between observations: perturb params and
        # verify parity still holds at the new hypers (caches are
        # hyper-independent, so this is the key invariant).
        params = jax.tree.map(lambda p: p + 0.01, params)
        got2 = wiski_mll(model, params, state, CFG)
        want2 = _oracle_mll(model, params, x[: t + 1], y[: t + 1], noise[: t + 1])
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-7, atol=1e-7)

    xt = x[:4] * 0.5
    mean, _ = wiski_predict(model, params, state, xt, CFG)
    kb = {k: v[0] for k, v in params["kernel"].items()}
    K_train = ski_kernel_matrix(model.kernel, kb, model.grid, x)
    K_cross = ski_kernel_matrix(model.kernel, kb, model.grid, xt, x)
    K_test = ski_kernel_matrix(model.kernel, kb, model.grid, xt)
    m_ref, _ = exact_posterior(K_train, K_cross, jnp.diagonal(K_test), y[:, 0], noise[:, 0], jitter=0.0)
    np.testing.assert_allclose(np.asarray(mean[0]), np.asarray(m_ref), rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_batch_condition_matches_sequential():
    model, params, x, y, noise = _setup(B=2, n=16, seed=5)
    state0 = wiski_init(model, x[:8], y[:8], noise[:8], root_jitter=1e-12)
    batched = wiski_condition(model, state0, x[8:], y[8:], noise[8:])
    seq = state0
    for t in range(8, 16):
        seq = wiski_condition(model, seq, x[t : t + 1], y[t : t + 1], noise[t : t + 1])
    np.testing.assert_allclose(np.asarray(batched.wty), np.asarray(seq.wty), atol=1e-10)
    np.testing.assert_allclose(np.asarray(batched.roots.mat), np.asarray(seq.roots.mat), atol=1e-10)
    got_b = wiski_mll(model, params, batched, CFG)
    got_s = wiski_mll(model, params, seq, CFG)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(got_s), rtol=1e-8)


def test_skip_logdet_forward_grad_intact():
    model, params, x, y, noise = _setup(B=1)
    state = wiski_init(model, x, y, noise, root_jitter=1e-12)
    cfg_skip = CFG.replace(skip_logdet_forward=True)

    full = wiski_mll(model, params, state, CFG)
    skipped = wiski_mll(model, params, state, cfg_skip)
    assert not np.allclose(np.asarray(full), np.asarray(skipped))

    g_full = jax.grad(lambda p: -jnp.sum(wiski_mll(model, p, state, CFG)))(params)
    g_skip = jax.grad(lambda p: -jnp.sum(wiski_mll(model, p, state, cfg_skip)))(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_full)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_skip)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_s), rtol=1e-10)
