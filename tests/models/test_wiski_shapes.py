"""Shape/cache unit tests, mirroring the reference's
``tests/models/test_batched_online_ski_gp_model.py`` pattern: exact cache
shapes, num_data bookkeeping, fantasy expansion."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_expand,
    wiski_fantasize,
    wiski_predict,
)

DT = jnp.float64


def _model(B, d=1, grid_size=10):
    grid = Grid.create([(-1.5, 1.5)] * d, grid_size, dtype=DT)
    return WiskiModel(RBFKernel(), grid, num_outputs=B)


@pytest.mark.slow
def test_cache_shapes_batched():
    B, n, m = 2, 7, 10
    model = _model(B)
    x = jnp.linspace(-1, 1, n, dtype=DT)[:, None]
    y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 0])], axis=-1)
    noise = jnp.ones((n, B), DT)
    state = wiski_init(model, x, y, noise)
    assert state.wty.shape == (B, m, 1)
    assert state.ydy.shape == (B,)
    assert state.roots.mat.shape == (B, m, m)
    assert state.roots.root.shape == (B, m, m)
    assert state.d_logdet.shape == (B,)
    assert int(state.num_data) == n


@pytest.mark.slow
def test_condition_bumps_num_data():
    model = _model(1)
    x = jnp.linspace(-1, 1, 5, dtype=DT)[:, None]
    y = jnp.sin(x)
    noise = jnp.ones_like(y)
    state = wiski_init(model, x, y, noise)
    new = wiski_condition(model, state, x[:2], y[:2], noise[:2])
    assert int(new.num_data) == 7
    assert int(state.num_data) == 5  # immutable: original untouched


@pytest.mark.slow
def test_fantasize_shapes():
    B, F, q = 2, 3, 2
    model = _model(B)
    m = model.grid.num_points
    x = jnp.linspace(-1, 1, 6, dtype=DT)[:, None]
    y = jnp.stack([jnp.sin(x[:, 0]), jnp.cos(x[:, 0])], axis=-1)
    noise = jnp.ones((6, B), DT)
    state = wiski_init(model, x, y, noise)

    fx = jnp.zeros((F, q, 1), DT)
    fy = jnp.ones((F, q, B), DT)
    fn = jnp.ones((F, q, B), DT)
    fant = wiski_fantasize(model, state, fx, fy, fn)
    assert fant.wty.shape == (F, B, m, 1)
    assert fant.roots.mat.shape == (F, B, m, m)
    assert np.all(np.asarray(fant.num_data) == 6 + q)

    expanded = wiski_expand(state, F)
    assert expanded.ydy.shape == (F, B)


def test_predict_runs_jitted():
    model = _model(1, d=2, grid_size=8)
    params = model.init_params(2, dtype=DT)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (9, 2), minval=-1, maxval=1, dtype=DT)
    y = jnp.sin(x[:, :1])
    noise = jnp.ones_like(y)
    state = wiski_init(model, x, y, noise)

    @jax.jit
    def run(p, s, xt):
        return wiski_predict(model, p, s, xt)

    mean, var = run(params, state, x)
    assert mean.shape == (1, 9)
    assert var.shape == (1, 9)
    assert bool(jnp.isfinite(mean).all() and jnp.isfinite(var).all())
    assert bool((var > 0).all())
