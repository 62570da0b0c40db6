"""Rank-capped large-grid WISKI tests: full-rank parity vs the dense core,
rank-capped accuracy, and a large-grid (m=4096) smoke that the dense path
could not touch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import WiskiModel, wiski_init, wiski_mll, wiski_predict, wiski_condition
from online_gp_tpu.models.wiski_lowrank import (
    WiskiLowRankModel,
    wiski_lowrank_init,
    wiski_lowrank_condition,
    wiski_lowrank_mll,
    wiski_lowrank_predict,
)

CFG = SolverConfig()


def _data(n=120, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (n, 1), minval=-1.0, maxval=1.0)
    y = jnp.sin(4 * x[:, 0]) + 0.1 * jax.random.normal(ky, (n,))
    return x, y[:, None]


@pytest.mark.slow
def test_full_rank_matches_dense():
    x, y = _data()
    noise = jnp.full_like(y, 0.1)
    grid = Grid.create([(-1.1, 1.1)], 32)
    m = grid.num_points
    dense = WiskiModel(RBFKernel(), grid, num_outputs=1)
    lowrank = WiskiLowRankModel(RBFKernel(), grid, rank=m, use_toeplitz=False)
    dp = dense.init_params(1, lengthscale=0.4)
    lp = lowrank.init_params(1, lengthscale=0.4)

    ds = wiski_init(dense, x, y, noise, root_jitter=1e-6)
    ls = wiski_lowrank_init(lowrank, x, y, noise)
    mll_d = float(wiski_mll(dense, dp, ds, CFG)[0])
    mll_l = float(wiski_lowrank_mll(lowrank, lp, ls, CFG))
    np.testing.assert_allclose(mll_l, mll_d, rtol=2e-3)

    xt = jnp.linspace(-0.9, 0.9, 25)[:, None]
    md, vd = wiski_predict(dense, dp, ds, xt, CFG)
    ml, vl = wiski_lowrank_predict(lowrank, lp, ls, xt, CFG)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(md[0]), atol=2e-2)
    np.testing.assert_allclose(np.asarray(vl), np.asarray(vd[0]), atol=2e-2)


@pytest.mark.slow
def test_rank_capped_still_accurate():
    x, y = _data(n=200)
    noise = jnp.full_like(y, 0.1)
    grid = Grid.create([(-1.1, 1.1)], 64)
    lowrank = WiskiLowRankModel(RBFKernel(), grid, rank=48, use_toeplitz=True)
    lp = lowrank.init_params(1, lengthscale=0.4)
    ls = wiski_lowrank_init(lowrank, x, y, noise)
    xt = jnp.linspace(-0.9, 0.9, 40)[:, None]
    mean, var = wiski_lowrank_predict(lowrank, lp, ls, xt, CFG)
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(4 * xt[:, 0])) ** 2)))
    assert rmse < 0.12
    assert bool((var > 0).all())


@pytest.mark.slow
def test_condition_tracks_dense():
    x, y = _data(n=80)
    noise = jnp.full_like(y, 0.1)
    grid = Grid.create([(-1.1, 1.1)], 24)
    m = grid.num_points
    lowrank = WiskiLowRankModel(RBFKernel(), grid, rank=m, use_toeplitz=False)
    lp = lowrank.init_params(1, lengthscale=0.4)
    ls = wiski_lowrank_init(lowrank, x[:50], y[:50], noise[:50])
    for t in range(50, 80):
        ls = wiski_lowrank_condition(lowrank, ls, x[t : t + 1], y[t : t + 1], noise[t : t + 1])
    assert int(ls.num_data) == 80

    dense = WiskiModel(RBFKernel(), grid, num_outputs=1)
    dp = dense.init_params(1, lengthscale=0.4)
    ds = wiski_init(dense, x, y, noise, root_jitter=1e-6)
    mll_l = float(wiski_lowrank_mll(lowrank, lp, ls, CFG))
    mll_d = float(wiski_mll(dense, dp, ds, CFG)[0])
    # per-datum MLLs are near zero here; compare on an absolute scale
    np.testing.assert_allclose(mll_l, mll_d, atol=2e-3)


@pytest.mark.slow
def test_large_grid_smoke():
    # m = 4096 — the dense path would need a 4096^2 root init per epoch;
    # here init is chunked exact-append + top-64 compression, and the
    # MLL rides structured Toeplitz MVMs.
    x, y = _data(n=500, seed=3)
    noise = jnp.full_like(y, 0.1)
    grid = Grid.create([(-1.1, 1.1)], 4096)
    # rank must cover A's effective rank (~n occupied stencils); the
    # reference's max_root_decomposition_size default of 512 does the same
    lowrank = WiskiLowRankModel(RBFKernel(), grid, rank=512, use_toeplitz=True)
    lp = lowrank.init_params(1, lengthscale=0.3)
    ls = wiski_lowrank_init(lowrank, x, y, noise)
    mll = float(wiski_lowrank_mll(lowrank, lp, ls, CFG))
    assert np.isfinite(mll)
    xt = jnp.linspace(-0.9, 0.9, 50)[:, None]
    mean, var = wiski_lowrank_predict(lowrank, lp, ls, xt, CFG)
    rmse = float(jnp.sqrt(jnp.mean((mean - jnp.sin(4 * xt[:, 0])) ** 2)))
    assert rmse < 0.15
    g = jax.grad(lambda p: -wiski_lowrank_mll(lowrank, p, ls, CFG))(lp)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


@pytest.mark.slow
def test_append_compress_stream_improves():
    """Streaming must IMPROVE the posterior (the exact append) and the
    buffer must compress when full (used resets toward rank).

    When rank(A) outgrows ``rank``, truncation loss is inherent to the
    rank-capped family (reference identical) — the cap here comfortably
    covers the stream's effective rank."""
    kx, ky = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.uniform(kx, (500, 1), minval=-1.0, maxval=1.0)
    y = (jnp.sin(4 * x[:, 0]) + 0.1 * jax.random.normal(ky, (500,)))[:, None]
    grid = Grid.create([(-1.1, 1.1)], 2048)
    model = WiskiLowRankModel(RBFKernel(), grid, rank=256, use_toeplitz=True)
    lp = model.init_params(1, lengthscale=0.3)
    ls = wiski_lowrank_init(model, x[:300], y[:300], jnp.full((300, 1), 0.01))
    xt = jnp.linspace(-0.9, 0.9, 60)[:, None]
    mean0, _ = wiski_lowrank_predict(model, lp, ls, xt, CFG)
    base = float(jnp.sqrt(jnp.mean((mean0 - jnp.sin(4 * xt[:, 0])) ** 2)))

    for t in range(300, 500):
        ls = wiski_lowrank_condition(model, ls, x[t : t + 1], y[t : t + 1], jnp.full((1, 1), 0.01))
    assert int(ls.used) <= model.k_buf  # appends + at least some headroom use
    mean1, _ = wiski_lowrank_predict(model, lp, ls, xt, CFG)
    streamed = float(jnp.sqrt(jnp.mean((mean1 - jnp.sin(4 * xt[:, 0])) ** 2)))
    assert streamed < base + 0.02  # no degradation; typically improves


@pytest.mark.slow
def test_kernel_aware_compression_tracks_dense():
    """Passing hypers into conditioning makes buffer compression truncate
    the WHITENED evidence operator K^{1/2} A K^{1/2} (eigh of L^T K L)
    instead of A itself. On clustered data — where A's top eigenspace
    (the cluster) is not what the posterior mean needs — the
    kernel-aware truncation tracks the dense oracle while the Frobenius
    truncation under-shrinks catastrophically."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    n_cl, n_sp = 48, 48
    x = jnp.concatenate(
        [
            0.02 * jax.random.normal(k1, (n_cl, 1)) + 0.5,
            jax.random.uniform(k2, (n_sp, 1), minval=-1, maxval=1),
        ]
    )
    y = jnp.sin(4 * x[:, :1]) + 0.05 * jax.random.normal(k3, (x.shape[0], 1))
    noise = jnp.full_like(y, 0.25)
    grid = Grid.create([(-1.2, 1.2)], 64)
    ls = 0.25
    dense = WiskiModel(RBFKernel(), grid, num_outputs=1)
    dp = dense.init_params(1, lengthscale=ls)
    lowrank = WiskiLowRankModel(RBFKernel(), grid, rank=8, buffer_cols=16, use_toeplitz=False)
    lp = lowrank.init_params(1, lengthscale=ls)

    ds = wiski_init(dense, x, y, noise, root_jitter=1e-10)
    xt = jnp.linspace(-1, 1, 101)[:, None]
    mean_d = jnp.asarray(wiski_predict(dense, dp, ds, xt)[0]).reshape(-1)

    def run(params_for_compress):
        # 16-point seed fills the buffer; every 8-point chunk then forces
        # a 16 -> 8 compression
        st = wiski_lowrank_init(lowrank, x[:16], y[:16], noise[:16])
        for s in range(16, x.shape[0], 8):
            st = wiski_lowrank_condition(
                lowrank, st, x[s : s + 8], y[s : s + 8], noise[s : s + 8],
                params_for_compress,
            )
        return wiski_lowrank_predict(lowrank, lp, st, xt)[0]

    err_f = float(jnp.max(jnp.abs(run(None) - mean_d)))
    err_k = float(jnp.max(jnp.abs(run(lp) - mean_d)))
    scale = float(jnp.max(jnp.abs(mean_d)))
    # kernel-aware: near-oracle at rank 8 of ~96 evidence directions
    assert err_k < 0.05 * scale, (err_k, scale)
    # and far better than the Frobenius A-truncation on this fixture
    assert err_k < 0.1 * err_f, (err_k, err_f)


def test_lowrank_rejects_buffer_not_exceeding_rank():
    """ADVICE r3 item 1: buffer_cols <= rank would make the absorb step
    size 0/negative and silently ingest nothing — must raise clearly."""
    import pytest

    from online_gp_tpu.kernels import RBFKernel
    from online_gp_tpu.ops import Grid
    from online_gp_tpu.models.wiski_lowrank import (
        WiskiLowRankModel,
        wiski_lowrank_init,
    )

    grid = Grid.create([(-1.1, 1.1)], 64)
    model = WiskiLowRankModel(RBFKernel(), grid, rank=32, buffer_cols=32)
    x = jnp.linspace(-1, 1, 16)[:, None]
    y = jnp.sin(3 * x)
    with pytest.raises(ValueError, match="buffer_cols"):
        wiski_lowrank_init(model, x, y, jnp.ones_like(y))


def test_lowrank_predict_skip_posterior_variances_mean_only():
    """ADVICE r3 item 3: with skip_posterior_variances the wrapper predict
    must return mean + observation-noise-only variance instead of raising."""
    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem
    from online_gp_tpu.config import SolverConfig

    x = np.linspace(-1, 1, 48)[:, None]
    y1 = np.sin(3 * x)
    cfg = SolverConfig(skip_posterior_variances=True)
    w = OnlineSKIRegression(IdentityStem(1), x, y1, grid_size=256, low_rank=16, cfg=cfg)
    mean, var = w.predict(x[:8])
    assert mean.shape == (8, 1) and var.shape == (8, 1)
    assert bool(jnp.isfinite(mean).all())
    # variance = observation noise only
    np.testing.assert_allclose(
        np.asarray(var), float(w.noise) * np.ones((8, 1)), rtol=1e-6
    )
    # multi-output route too
    y2 = np.concatenate([y1, np.cos(2 * x)], axis=-1)
    w2 = OnlineSKIRegression(IdentityStem(1), x, y2, grid_size=256, low_rank=16, cfg=cfg)
    mean2, var2 = w2.predict(x[:8])
    assert mean2.shape == (8, 2) and var2.shape == (8, 2)
    assert bool(jnp.isfinite(mean2).all()) and bool(jnp.isfinite(var2).all())
