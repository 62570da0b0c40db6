"""Unified low-rank regime under the flagship wrapper.

The reference exposes its large-grid configuration through the same model
class plus gpytorch settings (``max_root_decomposition_size`` /
``use_toeplitz``, ``/root/reference/experiments/bayesopt/bayesopt.py:280-291``);
here ``OnlineSKIRegression`` routes to the rank-capped core when
``low_rank=`` is passed or the grid exceeds the dense limit.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression
from online_gp_tpu.api.lowrank_regression import OnlineSKILowRankRegression
from online_gp_tpu.api.regression import DENSE_GRID_LIMIT
from online_gp_tpu.api.stems import IdentityStem


def _data(n, key=0, d=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(k1, (n, d), minval=-1, maxval=1)
    y = jnp.sin(4 * x[:, :1]) + 0.1 * jax.random.normal(k2, (n, 1))
    return np.asarray(x), np.asarray(y)


def test_explicit_low_rank_routes():
    x, y = _data(64)
    w = OnlineSKIRegression(IdentityStem(1), x, y, grid_size=64, low_rank=32)
    assert isinstance(w, OnlineSKILowRankRegression)
    assert w.model.rank == 32


def test_big_grid_auto_routes():
    x, y = _data(64)
    w = OnlineSKIRegression(IdentityStem(1), x, y, grid_size=DENSE_GRID_LIMIT + 1)
    assert isinstance(w, OnlineSKILowRankRegression)


def test_small_grid_stays_dense():
    x, y = _data(64)
    w = OnlineSKIRegression(IdentityStem(1), x, y, grid_size=16)
    assert type(w) is OnlineSKIRegression


@pytest.mark.slow
def test_multi_output_lowrank_stream():
    """Multi-output targets through the low-rank route: per-output hypers
    and caches over shared inputs (batched ``_b`` core), same L5 surface
    as the dense wrapper's batched WiskiModel (reference
    ``batched_fixed_noise_online_gp.py`` batching semantics)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = np.asarray(jax.random.uniform(k1, (96, 1), minval=-1, maxval=1))
    y = np.asarray(
        jnp.concatenate(
            [jnp.sin(4 * jnp.asarray(x)), jnp.cos(3 * jnp.asarray(x))], axis=-1
        )
        + 0.05 * jax.random.normal(k2, (96, 2))
    )
    w = OnlineSKIRegression(IdentityStem(1), x, y, grid_size=2048, lr=0.05, low_rank=64)
    assert isinstance(w, OnlineSKILowRankRegression)
    assert w.target_dim == 2
    w.fit(x, y, num_epochs=20)
    # stream PAST the root buffer (96 seed + 64 > k_buf = 128 at rank 64)
    # so the vmapped kernel-aware compress path (lax.cond under vmap with
    # per-output batched params) actually fires (ADVICE r3 item 2)
    for i in range(0, 64, 4):
        w.update(x[i : i + 4], y[i : i + 4])
    assert int(jnp.max(w.state.num_data)) == 96 + 64
    assert int(jnp.max(w.state.used)) <= w.model.k_buf
    mean, var = w.predict(x[:16])
    assert mean.shape == (16, 2) and var.shape == (16, 2)
    assert bool(jnp.isfinite(mean).all()) and bool((var > 0).all())
    assert w.noise.shape == (2,)
    rmse, nll = w.evaluate(x, y)
    assert np.isfinite(rmse) and np.isfinite(nll)
    assert rmse < 0.5, f"multi-output rmse {rmse}"


@pytest.mark.slow
def test_m8192_stream_sane_nll():
    """1-D m=8192 stream through the L5 API: per-step hyper fitting plus
    conditioning must leave a finite, sane NLL (the round-1 sigma^2
    collapse produced NLLs in the tens)."""
    x, y = _data(128, key=1)
    # rank 128 keeps the CPU-CI cost sane; the regime (m >> rank, Toeplitz
    # MVMs, append+compress streaming) is the same as rank 512
    w = OnlineSKIRegression(IdentityStem(1), x, y, grid_size=8192, lr=0.05, low_rank=128)
    assert isinstance(w, OnlineSKILowRankRegression)
    w.fit(x, y, num_epochs=30)
    xs, ys = _data(100, key=2)
    for i in range(100):
        w.update(xs[i : i + 1], ys[i : i + 1])
    xt, yt = _data(128, key=3)
    rmse, nll = w.evaluate(xt, yt)
    assert np.isfinite(rmse) and np.isfinite(nll)
    assert rmse < 0.5, f"rmse {rmse}"
    assert nll < 2.0, f"online NLL insane: {nll}"
