"""Mesh-sharded trials on the virtual 8-device CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import WiskiModel, wiski_init, wiski_mll
from online_gp_tpu.parallel import make_mesh, shard_leading, batched_trials_step


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
@pytest.mark.slow
def test_batched_trials_sharded_step():
    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev)
    T = n_dev
    grid = Grid.create([(-1.1, 1.1)], 10)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    opt = optax.adam(1e-2)

    def init_trial(seed):
        params = model.init_params(1)
        key = jax.random.PRNGKey(seed)
        x = jax.random.uniform(key, (12, 1), minval=-1, maxval=1)
        y = jnp.sin(2 * x)
        return params, opt.init(params), wiski_init(model, x, y, jnp.ones_like(y)), x[:2], y[:2]

    per = [init_trial(s) for s in range(T)]
    stack = lambda i: jax.tree.map(lambda *xs: jnp.stack(xs), *[t[i] for t in per])
    params, opt_states, states, xb, yb = (stack(i) for i in range(5))
    params = shard_leading(params, mesh)
    states = shard_leading(states, mesh)
    opt_states = shard_leading(opt_states, mesh)

    step = jax.jit(batched_trials_step(model, opt))
    new_params, _, new_states, losses = step(params, opt_states, states, xb, yb, jnp.ones_like(yb))
    jax.block_until_ready(losses)
    assert losses.shape == (T,)
    assert bool(jnp.isfinite(losses).all())
    assert int(new_states.num_data[0]) == 14
    # trial outputs really live on distinct devices
    assert len({d.id for d in new_states.wty.devices()}) == n_dev

    # sharded per-trial results match an unsharded replay of trial 0
    p0, o0, s0, x0, y0 = per[0]
    single = batched_trials_step(model, opt)(
        jax.tree.map(lambda a: a[None], p0),
        jax.tree.map(lambda a: a[None], o0),
        jax.tree.map(lambda a: a[None], s0),
        x0[None], y0[None], jnp.ones_like(y0)[None],
    )
    np.testing.assert_allclose(float(single[3][0]), float(losses[0]), rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_grid_sharded_mll_matches_replicated():
    """Tensor-parallel arm: row-sharding the m dimension must not change
    the MLL value (GSPMD inserts the collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, axis_name="tp")
    grid = Grid.create([(-1.1, 1.1)], 8 * n_dev)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1)
    params = model.init_params(1)
    x = jnp.linspace(-1, 1, 24)[:, None]
    y = jnp.sin(2 * x)
    state = wiski_init(model, x, y, jnp.ones_like(y))
    base = float(wiski_mll(model, params, state)[0])

    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "tp", None)))
    state_sh = state._replace(
        wty=shard(state.wty),
        roots=type(state.roots)(
            mat=shard(state.roots.mat), root=shard(state.roots.root), inv_root=shard(state.roots.inv_root)
        ),
    )
    with mesh:
        sharded = float(jax.jit(lambda p, s: wiski_mll(model, p, s)[0])(params, state_sh))
    np.testing.assert_allclose(sharded, base, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
@pytest.mark.slow
def test_grid_shard_axis_constraint():
    """SolverConfig.grid_shard_axis pins the m-row-sharded layout on the
    m x m intermediates: value parity with the replicated run, and the
    whole MLL-grad + predict program compiles/executes under the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from online_gp_tpu.config import SolverConfig
    from online_gp_tpu.models.wiski import wiski_predict

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, axis_name="tp")
    grid = Grid.create([(-1.1, 1.1)], 8 * n_dev)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
    params = model.init_params(1)
    x = jnp.linspace(-1, 1, 24)[:, None]
    y = jnp.sin(2 * x)
    state = wiski_init(model, x, y, jnp.ones_like(y))
    base = float(wiski_mll(model, params, state)[0])
    xt = jnp.linspace(-0.9, 0.9, 5)[:, None]
    base_mean, base_var = wiski_predict(model, params, state, xt)

    cfg = SolverConfig(grid_shard_axis="tp")
    shard = lambda a: jax.device_put(a, NamedSharding(mesh, P(None, "tp", None)))
    state_sh = state._replace(
        wty=shard(state.wty),
        roots=type(state.roots)(
            mat=shard(state.roots.mat), root=shard(state.roots.root),
            inv_root=shard(state.roots.inv_root),
        ),
    )

    @jax.jit
    def mll_grad_predict(p, s):
        loss, g = jax.value_and_grad(lambda pp: -jnp.sum(wiski_mll(model, pp, s, cfg)))(p)
        mean, var = wiski_predict(model, p, s, xt, cfg)
        return loss, g, mean, var

    with mesh:
        loss, g, mean, var = mll_grad_predict(params, state_sh)
    jax.block_until_ready(loss)
    np.testing.assert_allclose(-float(loss), base, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(base_mean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(base_var), rtol=1e-4, atol=1e-6)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
@pytest.mark.slow
def test_sharded_stream_blocked_matches_single_device():
    """Tensor-parallel blocked streaming (row-sharded L/B, one psum per
    chunk) must match the single-device blocked recursion exactly."""
    from online_gp_tpu.ops.interp import interp_coeffs
    from online_gp_tpu.ops.root_update import roots_stream_blocked
    from online_gp_tpu.parallel.mesh import sharded_stream_blocked

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, axis_name="tp")
    grid = Grid.create([(-1.1, 1.1)], 16)  # m = 16, divides by 4 and 8
    model = WiskiModel(RBFKernel(), grid, num_outputs=1)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (24, 1), minval=-1, maxval=1)
    y0 = jnp.sin(2 * x0)
    state = wiski_init(model, x0, y0, jnp.ones_like(y0))
    L0, B0 = state.roots.root[0], state.roots.inv_root[0]

    xs = jax.random.uniform(jax.random.fold_in(key, 1), (37, 1), minval=-1, maxval=1)
    idx, wv = interp_coeffs(model.grid, xs, detach=True)

    L_ref, B_ref = roots_stream_blocked(L0, B0, idx, wv, block=8, use_pallas=False)
    L_sh, B_sh = sharded_stream_blocked(L0, B0, idx, wv, mesh, block=8)
    assert "tp" in str(L_sh.sharding) or n_dev == 1
    np.testing.assert_allclose(np.asarray(L_sh), np.asarray(L_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(B_sh), np.asarray(B_ref), rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_localgp_experts_sharded_matches_replicated():
    """Expert-parallel LocalGP: sharding the expert dim over the mesh
    gives the same joint-MLL step and mixture posterior as running
    replicated on one device (the only cross-expert communication is the
    mixture reduction, lowered to a psum)."""
    import optax

    from online_gp_tpu.models.localgp import LocalGPModel, localgp_init
    from online_gp_tpu.parallel import (
        localgp_experts_step,
        make_mesh,
        replicate,
        shard_leading,
    )

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev)
    E = n_dev  # one expert (at least) per device
    model = LocalGPModel(RBFKernel(), max_data_per_model=8, max_experts=E)
    key = jax.random.PRNGKey(0)
    # enough points that every expert spawns at init (ceil(n/cap) == E)
    x = jax.random.uniform(key, (8 * E, 2), minval=-1, maxval=1)
    y = jnp.sin(3 * x[:, 0]) * jnp.cos(2 * x[:, 1])
    state = localgp_init(model, np.asarray(x), np.asarray(y))
    assert int(np.asarray(state.active).sum()) == E

    params = model.init_params(2)
    opt = optax.adam(1e-2)
    xt = jax.random.uniform(jax.random.PRNGKey(1), (16, 2), minval=-1, maxval=1)
    step = jax.jit(localgp_experts_step(model, opt))

    # replicated single-program run (ground truth)
    p_r, _, loss_r, mean_r, var_r = step(params, opt.init(params), state, xt)

    # expert-sharded run
    state_sh = shard_leading(state, mesh)
    params_rep = replicate(params, mesh)
    xt_rep = replicate(xt, mesh)
    with mesh:
        p_s, _, loss_s, mean_s, var_s = step(params_rep, opt.init(params_rep),
                                             state_sh, xt_rep)
    assert len({d.id for d in state_sh.x.devices()}) == n_dev
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_s), np.asarray(var_r), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_sharded_pred_stream_matches_single_device():
    """Tensor-parallel prequential streaming (row-sharded (m, m) cov cache,
    one psum per chunk) must reproduce the single-device blocked recursion:
    caches AND per-point prequential moments (VERDICT r3 item 9)."""
    from online_gp_tpu.ops.interp import interp_coeffs
    from online_gp_tpu.ops.pred_stream import pred_stream_blocked
    from online_gp_tpu.models.wiski import wiski_prediction_caches
    from online_gp_tpu.parallel.mesh import sharded_pred_stream_blocked

    n_dev = min(len(jax.devices()), 8)
    mesh = make_mesh(n_dev, axis_name="tp")
    grid = Grid.create([(-1.1, 1.1)], 16)  # m = 16, divides by 4 and 8
    model = WiskiModel(RBFKernel(), grid, num_outputs=1)
    params = model.init_params(1)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.uniform(key, (24, 1), minval=-1, maxval=1)
    y0 = jnp.sin(2 * x0)
    state = wiski_init(model, x0, y0, jnp.ones_like(y0))
    mean_cache, cov_cache = wiski_prediction_caches(model, params, state)
    C0, mu0 = cov_cache[0], mean_cache[0, :, 0]

    xs = jax.random.uniform(jax.random.fold_in(key, 1), (37, 1), minval=-1, maxval=1)
    ys = jnp.sin(2 * xs)[:, 0]
    nz = jnp.ones_like(ys)
    idx, wv = interp_coeffs(model.grid, xs, detach=True)

    C_ref, mu_ref, pm_ref, pv_ref = pred_stream_blocked(
        C0, mu0, idx, wv, ys, nz, block=8, use_pallas=False
    )
    C_sh, mu_sh, pm_sh, pv_sh = sharded_pred_stream_blocked(
        C0, mu0, idx, wv, ys, nz, mesh, block=8
    )
    assert "tp" in str(C_sh.sharding) or n_dev == 1
    np.testing.assert_allclose(np.asarray(C_sh), np.asarray(C_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(mu_sh), np.asarray(mu_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pm_sh), np.asarray(pm_ref), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pv_sh), np.asarray(pv_ref), rtol=1e-10, atol=1e-12)
