"""Incremental O(m^2) conditioning of the grid-space predictive caches
(wiski_pred_cache_condition) must equal rebuilding the caches from a
conditioned WiskiState — the O(m^3) route the reference takes after every
update (batched_fixed_noise_online_gp.py:369-404 memo-dump)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
)

DT = jnp.float64
CFG = SolverConfig()


def _setup(num_outputs=1):
    grid = Grid.create([(-1.2, 1.2)], 12, dtype=DT)
    model = WiskiModel(RBFKernel(), grid, num_outputs=num_outputs,
                      learn_additional_noise=True)
    params = model.init_params(1, dtype=DT)
    params["raw_second_noise"] = params["raw_second_noise"] + 0.3  # s2 != 1
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (20, 1), DT, -1, 1)
    y = jnp.sin(2.5 * x) * jnp.ones((1, num_outputs))
    noise = jnp.full_like(y, 0.4)
    state = wiski_init(model, x, y, noise)
    return model, params, state


@pytest.mark.slow
def test_pred_cache_condition_matches_rebuild():
    for B in (1, 2):
        model, params, state = _setup(B)
        caches = wiski_prediction_caches(model, params, state, CFG)

        key = jax.random.PRNGKey(1)
        xs = jax.random.uniform(key, (5, 1), DT, -1, 1)
        ys = jnp.cos(2 * xs) * jnp.ones((1, B))
        ns = jnp.full_like(ys, 0.6)

        # incremental: one 2-point block + three single points (mixing
        # block and sequential conditioning must not matter)
        inc = wiski_pred_cache_condition(model, caches, xs[:2], ys[:2], ns[:2])
        for i in range(2, 5):
            inc = wiski_pred_cache_condition(
                model, inc, xs[i : i + 1], ys[i : i + 1], ns[i : i + 1]
            )

        # rebuild: condition the O(m^2) state, then fresh caches
        st = wiski_condition(model, state, xs, ys, ns)
        rebuilt = wiski_prediction_caches(model, params, st, CFG)

        np.testing.assert_allclose(np.asarray(inc[0]), np.asarray(rebuilt[0]),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(inc[1]), np.asarray(rebuilt[1]),
                                   rtol=1e-7, atol=1e-9)

        # and predictions through the caches agree
        xt = jnp.linspace(-0.9, 0.9, 16, dtype=DT)[:, None]
        m_inc, v_inc = wiski_predict(model, params, st, xt, CFG, caches=inc)
        m_rb, v_rb = wiski_predict(model, params, st, xt, CFG, caches=rebuilt)
        np.testing.assert_allclose(np.asarray(m_inc), np.asarray(m_rb),
                                   rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(v_inc), np.asarray(v_rb),
                                   rtol=1e-6, atol=1e-9)


def test_wrapper_incremental_caches_match_rebuild():
    """Conditioning-only wrapper updates keep the predictive caches live
    via O(m^2) incremental conditioning; the predictions must match a
    forced O(m^3) rebuild, and hyper steps must invalidate."""
    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (64, 1)).astype(np.float32)
    y = np.sin(3 * x).astype(np.float32)
    xt = rng.uniform(-1, 1, (16, 1)).astype(np.float32)

    w = OnlineSKIRegression(IdentityStem(1), x[:32], y[:32], grid_size=12)
    m0, v0 = w.predict(xt)  # builds caches
    assert w._pred_caches is not None
    for i in range(32, 40):
        w.update(x[i : i + 1], y[i : i + 1], update_stem=False, update_gp=False)
        assert w._pred_caches is not None  # incrementally conditioned
        m_inc, v_inc = w.predict(xt)
        w._pred_caches = None  # force rebuild
        m_rb, v_rb = w.predict(xt)
        np.testing.assert_allclose(np.asarray(m_inc), np.asarray(m_rb), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(v_inc), np.asarray(v_rb), rtol=2e-3, atol=2e-6)

    # a hyper step invalidates
    w.update(x[40:41], y[40:41], update_stem=False, update_gp=True)
    assert w._pred_caches is None
    m1, v1 = w.predict(xt)
    assert np.isfinite(np.asarray(m1)).all() and float(np.asarray(v1).min()) > 0


def test_wrapper_skip_posterior_variances_path():
    """Mean-only configs (skip_posterior_variances) must predict (variance
    = observation noise only, like the reference's ZeroLazyTensor branch)
    and survive conditioning-only updates by invalidating instead of
    conditioning the absent covariance cache."""
    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (40, 1)).astype(np.float32)
    y = np.sin(3 * x).astype(np.float32)
    cfg = SolverConfig(skip_posterior_variances=True)

    w = OnlineSKIRegression(IdentityStem(1), x[:24], y[:24], grid_size=10, cfg=cfg)
    mean, var = w.predict(x[24:32])
    assert np.isfinite(np.asarray(mean)).all()
    s2 = float(np.exp(np.asarray(w.params["raw_second_noise"])[0]))
    np.testing.assert_allclose(np.asarray(var), s2, rtol=1e-6)

    w.update(x[32:33], y[32:33], update_stem=False, update_gp=False)
    mean2, _ = w.predict(x[24:32])
    assert np.isfinite(np.asarray(mean2)).all()


def test_predict_root_rejects_mean_only_caches():
    import pytest
    from online_gp_tpu.models.wiski import wiski_predict_root

    model, params, state = _setup(1)
    cfg = SolverConfig(skip_posterior_variances=True)
    xt = jnp.linspace(-0.5, 0.5, 4, dtype=DT)[:, None]
    with pytest.raises(ValueError, match="covariance cache"):
        wiski_predict_root(model, params, state, xt, cfg)
