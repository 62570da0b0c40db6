"""Masked-buffer exact GP + LocalGP expert-mixture tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.models.exact_online import (
    ExactGPModel,
    exact_data_init,
    exact_data_append,
    exact_gp_mll,
    exact_gp_posterior,
)
from online_gp_tpu.models.exact import exact_mll as dense_mll
from online_gp_tpu.models.localgp import (
    LocalGPModel,
    localgp_init,
    localgp_route,
    localgp_add_point,
    localgp_joint_mll,
    localgp_predict,
    localgp_log_prob,
)

DT = jnp.float64


@pytest.mark.slow
def test_masked_mll_matches_dense():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (13, 2), minval=-1, maxval=1, dtype=DT)
    y = jnp.sin(2 * x[:, :1])
    model = ExactGPModel(RBFKernel(), num_outputs=1, learn_noise=True, jitter=0.0)
    params = model.init_params(2, dtype=DT)
    data = exact_data_init(x, y, capacity=32)  # 19 masked-out rows
    got = exact_gp_mll(model, params, data)

    kb = {k: v[0] for k, v in params["kernel"].items()}
    K = model.kernel.matrix(kb, x, x)
    noise = jnp.exp(params["raw_noise"])[0] * jnp.ones(13, DT)
    want = dense_mll(K, y[:, 0], noise)
    np.testing.assert_allclose(float(got[0]), float(want), rtol=1e-10)


def test_append_grows_and_matches():
    x = jnp.linspace(-1, 1, 10, dtype=DT)[:, None]
    y = jnp.sin(x)
    model = ExactGPModel(RBFKernel(), jitter=0.0)
    params = model.init_params(1, dtype=DT)
    d_all = exact_data_init(x, y, capacity=16)
    d_inc = exact_data_init(x[:6], y[:6], capacity=8)
    for t in range(6, 10):
        d_inc = exact_data_append(d_inc, x[t : t + 1], y[t : t + 1])
    assert int(d_inc.count) == 10
    assert d_inc.x.shape[0] == 16  # capacity doubled 8 -> 16
    np.testing.assert_allclose(
        float(exact_gp_mll(model, params, d_inc)[0]),
        float(exact_gp_mll(model, params, d_all)[0]),
        rtol=1e-10,
    )


def test_exact_posterior_interpolates():
    x = jnp.linspace(-1, 1, 25, dtype=DT)[:, None]
    y = jnp.sin(3 * x)
    model = ExactGPModel(RBFKernel())
    params = model.init_params(1, dtype=DT, lengthscale=0.3)
    params["raw_noise"] = jnp.log(jnp.asarray([1e-4], DT))
    data = exact_data_init(x, y)
    mean, var = exact_gp_posterior(model, params, data, x)
    np.testing.assert_allclose(np.asarray(mean[0]), np.asarray(y[:, 0]), atol=1e-2)


@pytest.mark.slow
def test_localgp_routing_and_mixture():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (120, 1)).astype(np.float32)
    y = np.sin(3 * x[:, 0]).astype(np.float32)[:, None]
    model = LocalGPModel(RBFKernel(), max_data_per_model=64, max_experts=4)
    params = model.init_params(1, lengthscale=0.3)
    params["raw_noise"] = jnp.log(jnp.asarray(1e-2))
    state = localgp_init(model, x, y)
    assert int(np.asarray(state.active).sum()) == 2  # 120/64 -> 2 experts

    # route and add 40 more points
    extra = rng.uniform(-1, 1, (40, 1)).astype(np.float32)
    for xi in extra:
        e = localgp_route(model, params, state, xi)
        if e < 0:
            free = np.flatnonzero(np.asarray(state.active) == 0)
            if len(free):
                e = int(free[0])
            else:  # pool exhausted: least-filled non-full expert
                e = int(np.argmin(np.asarray(state.counts)))
        state = localgp_add_point(state, e, jnp.asarray(xi), jnp.sin(3 * xi[0]))
    assert int(np.asarray(state.counts).sum()) == 160

    mll = localgp_joint_mll(model, params, state)
    assert np.isfinite(float(mll))

    xt = jnp.linspace(-0.9, 0.9, 50, dtype=jnp.float32)[:, None]
    mean, var, stats = localgp_predict(model, params, state, xt)
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(3 * xt[:, 0])) ** 2)))
    assert rmse < 0.15
    lp = localgp_log_prob(stats, jnp.sin(3 * xt[:, 0]))
    assert bool(jnp.isfinite(lp).all())
