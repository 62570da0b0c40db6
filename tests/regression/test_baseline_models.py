"""Wrapper-level threshold tests for the baseline model families
(reference pattern: ``tests/regression/test_exact_regression.py`` and the
classification suites — end-to-end quality bars on synthetic data)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.api import (
    OnlineSVGPRegression,
    OnlineSVGPClassifier,
    OnlineSGPRegression,
    OnlineExactRegression,
    OnlineExactClassifier,
    OnlineLocalGPRegression,
    IdentityStem,
)
from online_gp_tpu.data import streaming_friedman, banana_dataset


@pytest.fixture(scope="module")
def fr():
    return streaming_friedman(n=1200, num_dims=2, seed=0)


@pytest.fixture(scope="module")
def banana():
    return banana_dataset(n=800, seed=0)


@pytest.mark.slow
def test_exact_regression(fr):
    tx, ty, ex, ey = fr
    m = OnlineExactRegression(IdentityStem(2), tx[:100], ty[:100], lr=0.05)
    m.fit(tx[:400], ty[:400], num_epochs=40)
    rmse, nll = m.evaluate(ex, ey)
    assert rmse <= 0.2 and nll <= 1.0
    for i in range(400, 420):
        m.update(tx[i : i + 1], ty[i : i + 1])
    rmse, nll = m.evaluate(ex, ey)
    assert rmse <= 0.2


@pytest.mark.slow
def test_svgp_regression(fr):
    tx, ty, ex, ey = fr
    m = OnlineSVGPRegression(IdentityStem(2), tx[:100], ty[:100], num_inducing=32, lr=0.05, streaming=True)
    m.fit(tx[:800], ty[:800], num_epochs=150, batch_size=256)
    rmse, _ = m.evaluate(ex, ey)
    assert rmse <= 0.6  # O-SVGP is the weak baseline (reference bars are low)
    for i in range(800, 820):
        m.update(tx[i : i + 1], ty[i : i + 1])
    rmse2, _ = m.evaluate(ex, ey)
    assert np.isfinite(rmse2)


@pytest.mark.slow
def test_svgp_closed_form_streaming(fr):
    """``variational_mode="closed_form"`` (variational EM: exact Bui
    E-step + hyper-only gradient M-step) must absorb a stream it never
    batch-trained on — init-set fit only, then 400 streamed points —
    and beat the same-budget pure-gradient arm's test RMSE."""
    tx, ty, ex, ey = fr
    arms = {}
    for mode in ("closed_form", "grad"):
        m = OnlineSVGPRegression(
            IdentityStem(2), tx[:100], ty[:100], num_inducing=32, lr=0.05,
            streaming=True, variational_mode=mode,
        )
        m.fit(tx[:100], ty[:100], num_epochs=60, batch_size=100)
        for i in range(100, 500, 4):
            m.update(tx[i : i + 4], ty[i : i + 4])
        arms[mode], _ = m.evaluate(ex, ey)
    assert np.isfinite(arms["closed_form"])
    assert arms["closed_form"] <= arms["grad"] + 1e-6
    assert arms["closed_form"] <= 0.45

    with pytest.raises(ValueError, match="conjugate"):
        OnlineSVGPClassifier(
            IdentityStem(2), tx[:20], (ty[:20, 0] > 0).astype(np.int32),
            variational_mode="closed_form",
        )


@pytest.mark.slow
def test_sgpr_regression(fr):
    tx, ty, ex, ey = fr
    m = OnlineSGPRegression(IdentityStem(2), tx[:100], ty[:100], num_inducing=32, lr=0.05, num_update_steps=0)
    m.fit(tx[:800], ty[:800], num_epochs=60)
    rmse, nll = m.evaluate(ex, ey)
    assert rmse <= 0.3
    for i in range(800, 900):
        m.update(tx[i : i + 1], ty[i : i + 1])
    rmse2, nll2 = m.evaluate(ex, ey)
    assert rmse2 <= rmse + 0.05  # filter-only streaming must not drift


@pytest.mark.slow
def test_localgp_regression(fr):
    tx, ty, ex, ey = fr
    m = OnlineLocalGPRegression(IdentityStem(2), tx[:200], ty[:200], lr=0.05, max_data_per_model=128, max_experts=8)
    m.fit(tx[:200], ty[:200], num_epochs=40)
    for i in range(200, 260):
        m.update(tx[i : i + 1], ty[i : i + 1])
    rmse, nll = m.evaluate(ex, ey)
    assert rmse <= 0.35
    assert m.num_experts >= 2


@pytest.mark.slow
def test_exact_classifier(banana):
    bx, by, ex, ey = banana
    c = OnlineExactClassifier(IdentityStem(2), bx[:100], by[:100], lr=0.05)
    c.fit(bx[:400], by[:400], num_epochs=40)
    assert c.evaluate(ex, ey) >= 0.89
    correct = 0
    for i in range(400, 500):
        pred = c.predict(bx[i : i + 1])
        correct += int(pred[0] == by[i])
        c.update(bx[i : i + 1], by[i : i + 1])
    assert correct / 100 >= 0.80
    assert c.evaluate(ex, ey) >= 0.89


@pytest.mark.slow
def test_svgp_classifier(banana):
    bx, by, ex, ey = banana
    v = OnlineSVGPClassifier(IdentityStem(2), bx[:100], by[:100], num_inducing=32, lr=0.1)
    v.fit(bx[:600], by[:600], num_epochs=150, batch_size=256)
    assert v.evaluate(ex, ey) >= 0.85
    correct = 0
    for i in range(600, 640):
        pred, _ = v.predict(bx[i : i + 1])
        correct += int(pred[0] == by[i])
        v.update(bx[i : i + 1], by[i : i + 1])
    assert correct / 40 >= 0.65
    assert v.evaluate(ex, ey) >= 0.75
