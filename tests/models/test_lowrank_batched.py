"""Batched (multi-output) low-rank core: vmapped variants must match the
single-output functions output-by-output (f64)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski_lowrank import (
    WiskiLowRankModel,
    lowrank_init_params_batched,
    wiski_lowrank_condition,
    wiski_lowrank_condition_b,
    wiski_lowrank_init,
    wiski_lowrank_init_b,
    wiski_lowrank_mll,
    wiski_lowrank_mll_b,
    wiski_lowrank_predict,
    wiski_lowrank_predict_b,
)


def _setup(B=3, n=48, d=1):
    model = WiskiLowRankModel(RBFKernel(), Grid.create([(-1.1, 1.1)] * d, 64),
                              rank=8, buffer_cols=24, learn_additional_noise=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n, d), minval=-1, maxval=1).astype(jnp.float64)
    y = jnp.stack([jnp.sin((b + 2) * x[:, 0]) for b in range(B)], axis=-1)
    noise = jnp.ones_like(y)
    params = lowrank_init_params_batched(model, d, B, dtype=jnp.float64)
    # distinct per-output hypers so parity is non-trivial
    params["kernel"]["raw_lengthscale"] = params["kernel"]["raw_lengthscale"] + \
        0.2 * jnp.arange(B, dtype=jnp.float64).reshape(B, 1)
    params["raw_second_noise"] = 0.1 * jnp.arange(B, dtype=jnp.float64)
    return model, params, x, y, noise, B


@pytest.mark.slow
def test_batched_matches_per_output():
    model, params, x, y, noise, B = _setup()
    cfg = SolverConfig()
    key = jax.random.PRNGKey(3)
    state_b = wiski_lowrank_init_b(model, x, y, noise, key=key)

    xq = jnp.linspace(-0.9, 0.9, 16, dtype=jnp.float64)[:, None]
    xs = jax.random.uniform(jax.random.PRNGKey(4), (4, 1), minval=-1, maxval=1).astype(jnp.float64)
    ys = jnp.stack([jnp.cos((b + 1) * xs[:, 0]) for b in range(B)], axis=-1)
    ns = jnp.ones_like(ys)
    state_b = wiski_lowrank_condition_b(model, state_b, xs, ys, ns)

    mll_b = wiski_lowrank_mll_b(model, params, state_b, cfg)
    mean_b, var_b = wiski_lowrank_predict_b(model, params, state_b, xq, cfg)
    assert mll_b.shape == (B,) and mean_b.shape == (B, 16) and var_b.shape == (B, 16)

    keys = jax.random.split(key, B)
    for b in range(B):
        p_b = jax.tree.map(lambda a: a[b], params)
        s = wiski_lowrank_init(model, x, y[:, b], noise[:, b], key=keys[b])
        s = wiski_lowrank_condition(model, s, xs, ys[:, b], ns[:, b])
        mll = wiski_lowrank_mll(model, p_b, s, cfg)
        mean, var = wiski_lowrank_predict(model, p_b, s, xq, cfg)
        np.testing.assert_allclose(float(mll_b[b]), float(mll), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(mean_b[b]), np.asarray(mean), rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(var_b[b]), np.asarray(var), rtol=1e-9, atol=1e-11)


def test_batched_hyper_step_and_stream():
    """A jitted multi-output hyper step + conditioning stream stays finite
    and per-output MLLs improve."""
    import optax

    model, params, x, y, noise, B = _setup()
    cfg = SolverConfig()
    state = wiski_lowrank_init_b(model, x, y, noise)
    opt = optax.adam(5e-2)

    @jax.jit
    def fit(params, state, opt_state):
        def step(carry, _):
            p, os_ = carry
            loss, g = jax.value_and_grad(
                lambda q: -jnp.sum(wiski_lowrank_mll_b(model, q, state, cfg))
            )(p)
            up, os_ = opt.update(g, os_, p)
            return (optax.apply_updates(p, up), os_), loss

        (p, _), losses = jax.lax.scan(step, (params, opt_state), None, length=30)
        return p, losses

    params2, losses = fit(params, state, opt.init(params))
    assert bool(jnp.isfinite(losses).all())
    assert float(losses[-1]) < float(losses[0])
