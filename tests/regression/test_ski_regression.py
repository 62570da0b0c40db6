"""End-to-end quality-threshold tests for the WISKI regression wrapper
(reference pattern: ``tests/regression/test_exact_regression.py`` —
synthetic 2-in/2-out sin/cos data, batch + online streams)."""

import jax
import numpy as np
import pytest

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem
from online_gp_tpu.data import sin_cos_dataset


@pytest.fixture(scope="module")
def data():
    return sin_cos_dataset(n=600, seed=0)


@pytest.mark.slow
def test_batch_fit_quality(data):
    tr_x, tr_y, te_x, te_y = data
    reg = OnlineSKIRegression(IdentityStem(2), tr_x[:50], tr_y[:50], lr=0.05, grid_size=16, grid_bound=1.0)
    reg.fit(tr_x[:300], tr_y[:300], num_epochs=40)
    rmse, nll = reg.evaluate(te_x, te_y)
    assert rmse <= 0.1
    assert nll <= 2.0


@pytest.mark.slow
def test_online_stream_quality(data):
    tr_x, tr_y, te_x, te_y = data
    reg = OnlineSKIRegression(IdentityStem(2), tr_x[:50], tr_y[:50], lr=0.05, grid_size=16, grid_bound=1.0)
    reg.fit(tr_x[:50], tr_y[:50], num_epochs=30)
    reg.set_lr(0.01)
    for i in range(50, 350):
        reg.update(tr_x[i : i + 1], tr_y[i : i + 1])
    rmse, nll = reg.evaluate(te_x, te_y)
    assert rmse <= 0.05
    assert nll <= 1.5
    assert int(reg.state.num_data) == 350


def test_update_returns_losses(data):
    tr_x, tr_y, *_ = data
    reg = OnlineSKIRegression(IdentityStem(2), tr_x[:30], tr_y[:30], lr=0.01, grid_size=12, grid_bound=1.0)
    s_loss, g_loss = reg.update(tr_x[30:31], tr_y[30:31])
    assert np.isfinite(g_loss)
    # identity stem has no parameters -> stem loss reported as 0
    assert s_loss == 0.0


def test_prequential_matches_predict_then_absorb(data):
    """wrapper.prequential(): per-point predictions equal predict() on the
    prefix posterior, and the absorbed state matches absorb()."""
    tr_x, tr_y, *_ = data
    mk = lambda: OnlineSKIRegression(
        IdentityStem(2), tr_x[:40], tr_y[:40], lr=0.05, grid_size=12, grid_bound=1.0
    )
    a, b = mk(), mk()

    stream_x, stream_y = tr_x[40:61], tr_y[40:61]
    mean_pq, var_pq = a.prequential(stream_x, stream_y)

    means, vars_ = [], []
    for i in range(stream_x.shape[0]):
        m_i, v_i = b.predict(stream_x[i : i + 1])
        means.append(np.asarray(m_i))
        vars_.append(np.asarray(v_i))
        b.absorb(stream_x[i : i + 1], stream_y[i : i + 1])
    np.testing.assert_allclose(
        np.asarray(mean_pq), np.concatenate(means), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(var_pq), np.concatenate(vars_), atol=1e-5, rtol=1e-5
    )
    # f32 state: blocked vs per-point recursion differ only by fp
    # reassociation
    np.testing.assert_allclose(
        np.asarray(a.state.roots.root),
        np.asarray(b.state.roots.root),
        atol=1e-4,
    )
    assert int(a.state.num_data) == int(b.state.num_data) == 61

    # follow-up predicts ride the conditioned caches and agree
    m_a, v_a = a.predict(stream_x[:5])
    m_b, v_b = b.predict(stream_x[:5])
    np.testing.assert_allclose(np.asarray(m_a), np.asarray(m_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-5)
