"""Spectral-mixture 1-D regression smoke test (VERDICT r3 item 10).

CI guard for the capability demonstrated by the reference's
``notebooks/regression_viz_1D.ipynb`` (WISKI with
``SpectralMixtureKernel(num_mixtures=3)``) and this repo's
``examples/regression_viz_1d.py``: the SM-kernel SKI fit must recover a
two-frequency signal (train-range RMSE below threshold) and remain finite
when extrapolating past the data, scaled down for CI runtime.
"""

import math

import jax.numpy as jnp
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem


def test_sm_kernel_1d_fit_reproduces_notebook_quality():
    rng = np.random.RandomState(0)
    n = 224
    x = np.sort(rng.uniform(-1, 1, (n, 1)), axis=0).astype(np.float32)

    def f(t):
        return np.sin(2 * math.pi * 2.0 * t) + 0.5 * np.sin(2 * math.pi * 5.0 * t)

    y = (f(x) + 0.05 * rng.randn(n, 1)).astype(np.float32)
    n_init, n_batch = 64, 160

    model = OnlineSKIRegression(
        IdentityStem(1), x[:n_init], y[:n_init], lr=0.03, grid_size=64, kernel="sm3"
    )
    model.fit(x[:n_batch], y[:n_batch], num_epochs=100)

    # stream the tail through constant-time conditioning (chunked —
    # same math as the notebook's per-point loop, CI-friendly)
    for i in range(n_batch, n, 8):
        model.update(x[i : i + 8], y[i : i + 8])

    # in-range posterior mean recovers the two-frequency signal
    line = np.linspace(-1, 1, 200, dtype=np.float32)[:, None]
    mean, var = model.predict(line)
    mean = np.asarray(mean)[:, 0]
    rmse = float(np.sqrt(np.mean((mean - f(line)[:, 0]) ** 2)))
    assert rmse < 0.2, f"SM-kernel dense-line RMSE {rmse}"
    assert bool(jnp.isfinite(jnp.asarray(var)).all()) and bool((var > 0).all())

    # extrapolation past the data stays finite with growing uncertainty
    far = np.linspace(1.05, 1.4, 32, dtype=np.float32)[:, None]
    m_far, v_far = model.predict(far)
    assert bool(jnp.isfinite(m_far).all()) and bool(jnp.isfinite(v_far).all())
    assert float(np.mean(np.asarray(v_far))) >= float(np.mean(np.asarray(var)))
