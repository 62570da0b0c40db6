"""Blocked interleaved evaluate-then-condition streaming
(wiski_prequential_stream) must be point-for-point identical to the slow
prequential loop the reference runs (predict from the posterior over the
prefix, then condition; /root/reference/experiments/regression.py:49-54):
per-point predictions, final predictive caches, and final state all match
the {wiski_predict -> wiski_pred_cache_condition -> wiski_condition}
sequential oracle."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_condition,
    wiski_init,
    wiski_pred_cache_condition,
    wiski_predict,
    wiski_prediction_caches,
    wiski_prequential_stream,
)

CFG = SolverConfig()


def _setup(num_outputs, dtype):
    grid = Grid.create([(-1.2, 1.2)] * 2, 8, dtype=dtype)
    model = WiskiModel(
        RBFKernel(), grid, num_outputs=num_outputs, learn_additional_noise=True
    )
    params = model.init_params(2, dtype=dtype)
    params["raw_second_noise"] = params["raw_second_noise"] + 0.25  # s2 != 1
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (30, 2), dtype, -1, 1)
    y = jnp.sin(2.5 * x[:, :1]) * jnp.ones((1, num_outputs), dtype)
    noise = jnp.full_like(y, 0.4)
    state = wiski_init(model, x, y, noise)
    return model, params, state


def _stream_data(num_outputs, dtype, n=21):
    key = jax.random.PRNGKey(3)
    kx, ky, kn = jax.random.split(key, 3)
    xs = jax.random.uniform(kx, (n, 2), dtype, -1, 1)
    ys = jnp.cos(2 * xs[:, :1]) * jnp.ones((1, num_outputs), dtype)
    ys = ys + 0.05 * jax.random.normal(ky, ys.shape, dtype)
    ns = 0.3 + 0.4 * jax.random.uniform(kn, ys.shape, dtype)
    return xs, ys, ns


def _oracle(model, params, state, caches, xs, ys, ns):
    """Slow per-point loop: predict from the prefix posterior, then
    condition both the caches and the state."""
    pms, pvs = [], []
    for t in range(xs.shape[0]):
        pm, pv = wiski_predict(
            model, params, state, xs[t : t + 1], CFG, caches=caches
        )
        pms.append(pm[:, 0])
        pvs.append(pv[:, 0])
        caches = wiski_pred_cache_condition(
            model, caches, xs[t : t + 1], ys[t : t + 1], ns[t : t + 1]
        )
        state = wiski_condition(
            model, state, xs[t : t + 1], ys[t : t + 1], ns[t : t + 1]
        )
    return state, caches, jnp.stack(pms, axis=1), jnp.stack(pvs, axis=1)


def _assert_matches(model, params, state, dtype, block_size, tol, n=21):
    caches = wiski_prediction_caches(model, params, state, CFG)
    xs, ys, ns = _stream_data(model.num_outputs, dtype, n)
    st_o, caches_o, pm_o, pv_o = _oracle(
        model, params, state, caches, xs, ys, ns
    )
    st_b, caches_b, pm_b, pv_b = wiski_prequential_stream(
        model, params, state, caches, xs, ys, ns, block_size=block_size
    )
    np.testing.assert_allclose(pm_b, pm_o, atol=tol, rtol=tol)
    np.testing.assert_allclose(pv_b, pv_o, atol=tol, rtol=tol)
    np.testing.assert_allclose(caches_b[0], caches_o[0], atol=tol, rtol=tol)
    np.testing.assert_allclose(caches_b[1], caches_o[1], atol=tol, rtol=tol)
    np.testing.assert_allclose(st_b.roots.root, st_o.roots.root, atol=tol, rtol=tol)
    np.testing.assert_allclose(st_b.wty, st_o.wty, atol=tol, rtol=tol)
    np.testing.assert_allclose(
        float(st_b.num_data), float(st_o.num_data), atol=0
    )


@pytest.mark.slow
def test_prequential_stream_matches_sequential_f64():
    model, params, state = _setup(1, jnp.float64)
    _assert_matches(model, params, state, jnp.float64, block_size=8, tol=1e-6)


@pytest.mark.slow
def test_prequential_stream_multioutput_f64():
    model, params, state = _setup(3, jnp.float64)
    _assert_matches(model, params, state, jnp.float64, block_size=8, tol=1e-6)


@pytest.mark.slow
def test_prequential_stream_single_chunk_and_ragged():
    # n < block (single padded chunk) and n not a multiple of block
    model, params, state = _setup(1, jnp.float64)
    _assert_matches(model, params, state, jnp.float64, block_size=64, tol=1e-6, n=5)
    _assert_matches(model, params, state, jnp.float64, block_size=4, tol=1e-6, n=11)


@pytest.mark.slow
def test_pred_chunk_pallas_interpret_parity_f32():
    """The fused Pallas pred-chunk kernel (interpret mode on CPU) matches
    the XLA factor recursion at f32, single-output and batched."""
    from online_gp_tpu.ops.pred_stream import (
        pred_stream_blocked,
        pred_stream_blocked_batched,
    )
    from online_gp_tpu.ops.interp import interp_coeffs

    model, params, state = _setup(2, jnp.float64)
    caches = wiski_prediction_caches(model, params, state, CFG)
    xs, ys, ns = _stream_data(2, jnp.float64, 21)
    idx, w = interp_coeffs(model.grid, xs, detach=True)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    C = f32(caches[1])
    mu = f32(caches[0][..., 0])
    wv, y_t, nz_t = f32(w), f32(ys.T), f32(jnp.maximum(ns.T, 1e-7))

    # single-output
    outs_p = pred_stream_blocked(
        C[0], mu[0], idx, wv, y_t[0], nz_t[0], block=8,
        use_pallas=True, pallas_interpret=True,
    )
    outs_x = pred_stream_blocked(
        C[0], mu[0], idx, wv, y_t[0], nz_t[0], block=8, use_pallas=False
    )
    for a, b in zip(outs_p, outs_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # batched over outputs
    outs_pb = pred_stream_blocked_batched(
        C, mu, idx, wv, y_t, nz_t, block=8, use_pallas=True, pallas_interpret=True
    )
    outs_xb = pred_stream_blocked_batched(
        C, mu, idx, wv, y_t, nz_t, block=8, use_pallas=False
    )
    for a, b in zip(outs_pb, outs_xb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
