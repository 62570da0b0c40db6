"""Slim-state WISKI streaming: the opt-in mode that drops the Gram
accumulator from the hot state (VERDICT round-1 item 8 / TODO 'state
slimming'). The slim stream must produce bit-identical roots, MLL, and
predictions to the full-state stream, keep ``wiski_refresh_roots`` /
``wiski_check_decomposition`` functional, and work through the
``OnlineSKIRegression(slim_state=True)`` wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_check_decomposition,
    wiski_condition,
    wiski_init,
    wiski_mll,
    wiski_predict,
    wiski_refresh_roots,
    wiski_slim,
    wiski_unslim,
)

DT = jnp.float64
CFG = SolverConfig()


def _setup(n=24, grid_size=12):
    grid = Grid.create([(-1.2, 1.2)], grid_size, dtype=DT)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    params = model.init_params(1, dtype=DT)
    x = jnp.linspace(-1, 1, n, dtype=DT)[:, None]
    y = jnp.sin(2.5 * x)
    noise = jnp.full_like(y, 0.5)
    state = wiski_init(model, x, y, noise)
    return model, params, state, x, y, noise


@pytest.mark.slow
def test_slim_stream_matches_full():
    model, params, state, x, y, noise = _setup()
    slim = wiski_slim(state)
    assert slim.roots.mat is None

    full = state
    for i in range(10):
        xi = jnp.asarray([[np.cos(0.7 * i)]], DT)
        yi = jnp.sin(2.5 * xi)
        ni = jnp.full_like(yi, 0.5)
        full = wiski_condition(model, full, xi, yi, ni)
        slim = wiski_condition(model, slim, xi, yi, ni)

    np.testing.assert_allclose(np.asarray(slim.roots.root), np.asarray(full.roots.root), atol=1e-12)
    np.testing.assert_allclose(np.asarray(slim.wty), np.asarray(full.wty), atol=1e-12)

    # MLL and prediction identical (neither reads the accumulator)
    np.testing.assert_allclose(
        np.asarray(wiski_mll(model, params, slim, CFG)),
        np.asarray(wiski_mll(model, params, full, CFG)),
        atol=1e-12,
    )
    xt = jnp.linspace(-0.9, 0.9, 7, dtype=DT)[:, None]
    ms, vs = wiski_predict(model, params, slim, xt, CFG)
    mf, vf = wiski_predict(model, params, full, xt, CFG)
    np.testing.assert_allclose(np.asarray(ms), np.asarray(mf), atol=1e-12)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vf), atol=1e-12)


def test_slim_refresh_and_check():
    model, params, state, *_ = _setup()
    slim = wiski_slim(state)
    for i in range(5):
        xi = jnp.asarray([[0.2 * i - 0.4]], DT)
        yi = jnp.sin(2.5 * xi)
        slim = wiski_condition(model, slim, xi, yi, jnp.full_like(yi, 0.5))

    health = wiski_check_decomposition(slim)
    assert "inverse_root_err" in health
    assert float(health["inverse_root_err"][0]) < 1e-8

    refreshed = wiski_refresh_roots(slim, jitter=1e-12)
    assert refreshed.roots.mat is None  # stays slim
    # refreshed roots reconstruct the same Gram matrix
    recon_r = refreshed.roots.root @ refreshed.roots.root.swapaxes(-1, -2)
    recon_s = slim.roots.root @ slim.roots.root.swapaxes(-1, -2)
    np.testing.assert_allclose(np.asarray(recon_r), np.asarray(recon_s), rtol=1e-8, atol=1e-7)

    fat = wiski_unslim(slim)
    assert fat.roots.mat is not None
    full_health = wiski_check_decomposition(fat)
    assert float(full_health["root_recon_rel_err"][0]) < 1e-10


def test_wrapper_slim_state():
    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (64, 1)).astype(np.float32)
    y = np.sin(3 * x).astype(np.float32)
    wrapper = OnlineSKIRegression(
        IdentityStem(1), x, y, grid_size=16, slim_state=True, refresh_roots_every=16
    )
    assert wrapper.state.roots.mat is None
    for i in range(20):
        wrapper.update(x[i : i + 1], y[i : i + 1])
    assert wrapper.state.roots.mat is None  # refresh keeps it slim
    rmse, nll = wrapper.evaluate(x, y)
    assert np.isfinite(rmse) and np.isfinite(nll)
    assert rmse < 0.5


@pytest.mark.slow
def test_slim_long_stream_f32_drift_bounded():
    """20k f32 rank-1 updates on the slim path with periodic re-anchoring:
    the maintained inverse-root must stay consistent (B^T L ~= I) and the
    posterior finite/sane — guards the production streaming configuration
    (slim_state + refresh_roots_every)."""
    import jax

    grid = Grid.create([(-1.2, 1.2)], 16, dtype=jnp.float32)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    params = model.init_params(1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (64, 1), jnp.float32, -1, 1)
    y0 = jnp.sin(2.5 * x0)
    state = wiski_slim(wiski_init(model, x0, y0, jnp.ones_like(y0)))

    from online_gp_tpu.ops.interp import interp_coeffs
    from online_gp_tpu.models.wiski import wiski_condition_coeffs

    n, refresh_every = 20_000, 2_000
    xs = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1), jnp.float32, -1, 1)
    ys = jnp.sin(2.5 * xs)

    @jax.jit
    def stream_block(state, xb, yb):
        idxs, ws = interp_coeffs(model.grid, xb, detach=True)

        def step(s, inp):
            ii, wi, yi = inp
            return wiski_condition_coeffs(
                model, s, ii[None], wi[None], yi[None], jnp.ones((1, 1), jnp.float32)
            ), 0.0

        s, _ = jax.lax.scan(step, state, (idxs, ws, yb))
        return s

    for start in range(0, n, refresh_every):
        state = stream_block(state, xs[start : start + refresh_every],
                             ys[start : start + refresh_every])
        state = wiski_refresh_roots(state)

    health = wiski_check_decomposition(state)
    assert float(health["inverse_root_err"][0]) < 1e-2
    xt = jnp.linspace(-0.9, 0.9, 64, dtype=jnp.float32)[:, None]
    mean, var = wiski_predict(model, params, state, xt, CFG)
    rmse = float(jnp.sqrt(jnp.mean((mean[0] - jnp.sin(2.5 * xt)[:, 0]) ** 2)))
    assert jnp.isfinite(mean).all() and jnp.isfinite(var).all()
    assert float(var.min()) > 0
    assert rmse < 0.1, f"posterior degraded over the long stream: rmse {rmse}"


@pytest.mark.parametrize("block_size", [0, 1, 5, 32])
def test_wiski_stream_matches_sequential(block_size):
    """wiski_stream's vectorized-outside-scan plan must equal scanning
    wiski_condition point by point (f64, both slim and full states), for
    the per-step scan (block_size<=1) and the blocked-MXU recursion at
    block sizes both below and above the stream length."""
    from online_gp_tpu.models.wiski import wiski_stream

    model, params, state, *_ = _setup()
    key = jax.random.PRNGKey(3)
    xs = jax.random.uniform(key, (12, 1), DT, -1, 1)
    ys = jnp.sin(2.5 * xs)
    ns = jnp.full_like(ys, 0.7)

    for st0 in (state, wiski_slim(state)):
        seq = st0
        for i in range(xs.shape[0]):
            seq = wiski_condition(model, seq, xs[i : i + 1], ys[i : i + 1], ns[i : i + 1])
        bulk = wiski_stream(model, st0, xs, ys, ns, block_size=block_size)
        np.testing.assert_allclose(np.asarray(bulk.roots.root), np.asarray(seq.roots.root), atol=1e-11)
        np.testing.assert_allclose(np.asarray(bulk.roots.inv_root), np.asarray(seq.roots.inv_root), atol=1e-11)
        np.testing.assert_allclose(np.asarray(bulk.wty), np.asarray(seq.wty), atol=1e-11)
        np.testing.assert_allclose(np.asarray(bulk.ydy), np.asarray(seq.ydy), atol=1e-11)
        np.testing.assert_allclose(np.asarray(bulk.d_logdet), np.asarray(seq.d_logdet), atol=1e-11)
        assert int(bulk.num_data) == int(seq.num_data)
        if st0.roots.mat is None:
            assert bulk.roots.mat is None
        else:
            np.testing.assert_allclose(np.asarray(bulk.roots.mat), np.asarray(seq.roots.mat), atol=1e-10)


def test_wrapper_absorb_bulk_stream():
    """OnlineSKIRegression.absorb == the update() conditioning channel."""
    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, (96, 1)).astype(np.float32)
    y = np.sin(3 * x).astype(np.float32)

    a = OnlineSKIRegression(IdentityStem(1), x[:32], y[:32], grid_size=12, slim_state=True)
    b = OnlineSKIRegression(IdentityStem(1), x[:32], y[:32], grid_size=12, slim_state=True)
    a.absorb(x[32:], y[32:])
    for i in range(32, 96):
        b.update(x[i : i + 1], y[i : i + 1], update_stem=False, update_gp=False)
    np.testing.assert_allclose(
        np.asarray(a.state.roots.root), np.asarray(b.state.roots.root), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(a.state.wty), np.asarray(b.state.wty), rtol=1e-4, atol=1e-6)
    assert int(a.state.num_data) == int(b.state.num_data)
    ra, _ = a.evaluate(x, y)
    rb, _ = b.evaluate(x, y)
    np.testing.assert_allclose(ra, rb, rtol=1e-3)


def test_long_stream_blocked_f32_with_refresh():
    """Same long-stream drift guard for the blocked-product bulk path
    (wiski_stream, f32): 20k points through rank-128 chunks with periodic
    root refreshes must keep B^T L ~= I and a sane posterior."""
    grid = Grid.create([(-1.2, 1.2)], 16, dtype=jnp.float32)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    params = model.init_params(1, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (64, 1), jnp.float32, -1, 1)
    y0 = jnp.sin(2.5 * x0)
    state = wiski_slim(wiski_init(model, x0, y0, jnp.ones_like(y0)))

    from online_gp_tpu.models.wiski import wiski_stream

    n, refresh_every = 20_000, 4_000
    xs = jax.random.uniform(jax.random.fold_in(key, 1), (n, 1), jnp.float32, -1, 1)
    ys = jnp.sin(2.5 * xs)

    absorb = jax.jit(
        lambda st, xb, yb: wiski_stream(model, st, xb, yb, jnp.ones_like(yb))
    )
    for start in range(0, n, refresh_every):
        state = absorb(state, xs[start : start + refresh_every],
                       ys[start : start + refresh_every])
        state = wiski_refresh_roots(state)

    health = wiski_check_decomposition(state)
    assert float(health["inverse_root_err"][0]) < 1e-2
    xt = jnp.linspace(-0.9, 0.9, 64, dtype=jnp.float32)[:, None]
    mean, var = wiski_predict(model, params, state, xt, CFG)
    rmse = float(jnp.sqrt(jnp.mean((mean[0] - jnp.sin(2.5 * xt)[:, 0]) ** 2)))
    assert jnp.isfinite(mean).all() and jnp.isfinite(var).all()
    assert float(var.min()) > 0
    assert rmse < 0.1, f"posterior degraded over the blocked long stream: rmse {rmse}"
