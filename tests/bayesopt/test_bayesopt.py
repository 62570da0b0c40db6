import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_gp_tpu.bayesopt.test_functions import make_test_function, TEST_FUNCTIONS
from online_gp_tpu.bayesopt.optimize import optimize_acqf
from online_gp_tpu.bayesopt import acquisitions as acq
from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import WiskiModel, wiski_init, wiski_predict


def test_known_optima():
    # negated convention: maxima at the canonical minimizers
    for name, argmin in [("Ackley", 0.0), ("Griewank", 0.0), ("Rastrigin", 0.0),
                         ("Levy", 1.0), ("Rosenbrock", 1.0)]:
        fn = make_test_function(name, 3)
        x_opt = jnp.full((1, 3), argmin)
        np.testing.assert_allclose(float(fn(x_opt)[0]), 0.0, atol=1e-5)
        x_rand = jnp.full((1, 3), 2.5)
        assert float(fn(x_rand)[0]) < -0.5  # strictly worse elsewhere


def test_optimize_acqf_concave():
    target = jnp.asarray([0.3, -0.2])
    acqf = lambda X: -jnp.sum((X - target) ** 2)
    bounds = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0]])
    x, val = optimize_acqf(acqf, bounds, q=1, num_restarts=4, raw_samples=16, maxiter=200, lr=0.1)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(target), atol=0.05)


@pytest.fixture(scope="module")
def wiski_posterior():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (40, 2), minval=-1, maxval=1)
    y = jnp.sin(3 * x[:, :1])
    grid = Grid.create([(-1.1, 1.1)] * 2, 10)
    model = WiskiModel(RBFKernel(), grid, num_outputs=1)
    params = model.init_params(2, lengthscale=0.5)
    state = wiski_init(model, x, y, jnp.ones_like(y) * 0.1)
    return model, params, state, x


def test_qei_nonnegative_and_informative(wiski_posterior):
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(1)
    cand = jnp.asarray([[0.5, 0.5]])
    best_hi = jnp.asarray(100.0)
    ei_hi = acq.q_expected_improvement(model, params, state, cand, best_hi, key)
    ei_lo = acq.q_expected_improvement(model, params, state, cand, jnp.asarray(-100.0), key)
    assert float(ei_hi) < 1e-4  # nothing improves on best_f=100
    assert float(ei_lo) > 50.0  # everything improves on best_f=-100


def test_qucb_exceeds_mean(wiski_posterior):
    model, params, state, x = wiski_posterior
    cand = jnp.asarray([[0.2, -0.4]])
    mean, _ = wiski_predict(model, params, state, cand)
    val = acq.q_upper_confidence_bound(model, params, state, cand, beta=4.0)
    assert float(val) > float(mean[0, 0])


@pytest.mark.slow
def test_qnipv_prefers_unexplored(wiski_posterior):
    model, params, state, x = wiski_posterior
    mc = jax.random.uniform(jax.random.PRNGKey(2), (128, 2), minval=-1, maxval=1)
    # conditioning anywhere reduces integrated variance -> acq > -mean(var)
    base_var = wiski_predict(model, params, state, mc)[1].mean()
    v = acq.q_negative_integrated_posterior_variance(model, params, state, jnp.asarray([[0.0, 0.0]]), mc)
    assert float(v) > -float(base_var)
    # it is differentiable wrt the candidate
    g = jax.grad(lambda c: acq.q_negative_integrated_posterior_variance(model, params, state, c, mc))(
        jnp.asarray([[0.1, 0.1]])
    )
    assert bool(jnp.isfinite(g).all())


@pytest.mark.slow
def test_qkg_and_qnei_finite(wiski_posterior):
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(3)
    disc = jax.random.uniform(key, (64, 2), minval=-1, maxval=1)
    kg = acq.q_knowledge_gradient(model, params, state, jnp.asarray([[0.3, 0.3]]), disc,
                                  jnp.asarray(0.5), key, num_fantasies=4)
    nei = acq.q_noisy_expected_improvement(model, params, state, jnp.asarray([[0.3, 0.3]]),
                                           x[:16], key, num_samples=64)
    assert np.isfinite(float(kg)) and np.isfinite(float(nei))
    assert float(nei) >= 0.0


@pytest.mark.slow
def test_bayesopt_loop_improves():
    jax.config.update("jax_platforms", "cpu")
    from online_gp_tpu.bayesopt.loop import run_bayesopt

    out = run_bayesopt(function="Ackley", dim=2, acqf="ucb", num_steps=8, num_init=8,
                       grid_size=8, fit_iters=20, seed=0, verbose=False)
    assert out["best_per_step"][-1] >= out["best_per_step"][0]
    assert len(out["records"]) == 8


def test_qucb_qbatch_mc_form(wiski_posterior):
    """q>1 rides botorch's beta*pi/2 MC estimator over joint samples: its
    q=1 specialization must agree with the analytic form in expectation,
    and adding a candidate can only increase the batch value."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(4)
    c1 = jnp.asarray([[0.2, -0.4]])
    analytic = acq.q_upper_confidence_bound(model, params, state, c1, 4.0)
    # MC path forced by q=2 with a duplicated candidate: max over two
    # identical points == the single-point value, so MC ~= analytic.
    c_dup = jnp.concatenate([c1, c1])
    mc_dup = acq.q_upper_confidence_bound(
        model, params, state, c_dup, 4.0, key, num_samples=4096
    )
    np.testing.assert_allclose(float(mc_dup), float(analytic), rtol=0.08)

    # a genuinely different second candidate can only help the batch max
    c2 = jnp.asarray([[0.2, -0.4], [-0.6, 0.7]])
    mc2 = acq.q_upper_confidence_bound(model, params, state, c2, 4.0, key, num_samples=4096)
    assert float(mc2) >= float(analytic) - 0.02  # within MC noise


@pytest.mark.slow
def test_qkg_optimized_lookahead_beats_grid(wiski_posterior):
    """Gradient-refined lookahead must dominate the grid-only form (the
    inner max is seeded at the discrete argmax and only moves uphill)."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(5)
    # coarse grid on purpose: refinement has room to improve
    disc = jax.random.uniform(key, (8, 2), minval=-1, maxval=1)
    cand = jnp.asarray([[0.3, 0.3]])
    kg_grid = acq.q_knowledge_gradient(
        model, params, state, cand, disc, jnp.asarray(0.5), key,
        num_fantasies=4, lookahead_steps=0,
    )
    kg_opt = acq.q_knowledge_gradient(
        model, params, state, cand, disc, jnp.asarray(0.5), key,
        num_fantasies=4, lookahead_steps=25,
    )
    assert np.isfinite(float(kg_opt))
    assert float(kg_opt) >= float(kg_grid) - 1e-6
    # and it stays differentiable w.r.t. the candidate
    g = jax.grad(
        lambda c: acq.q_knowledge_gradient(
            model, params, state, c, disc, jnp.asarray(0.5), key,
            num_fantasies=2, lookahead_steps=5,
        )
    )(cand)
    assert bool(jnp.isfinite(g).all())


def test_bayesopt_qbatch_improves():
    """q=4 batch BO on Ackley-2d improves best-value (VERDICT item 9)."""
    jax.config.update("jax_platforms", "cpu")
    from online_gp_tpu.bayesopt.loop import run_bayesopt

    out = run_bayesopt(function="Ackley", dim=2, acqf="ucb", num_steps=5, num_init=8,
                       batch_size=4, grid_size=8, fit_iters=20, seed=1, verbose=False)
    assert out["best_per_step"][-1] >= out["best_per_step"][0]


def test_bayesopt_resume_continues_campaign(tmp_path):
    """resume_from warm-starts the loop from a saved surrogate: the
    trajectory picks up where the checkpoint left off and the combined
    run keeps the best-so-far monotone."""
    jax.config.update("jax_platforms", "cpu")
    from online_gp_tpu.bayesopt.loop import run_bayesopt

    ckpt = str(tmp_path / "campaign")
    first = run_bayesopt(function="Ackley", dim=2, acqf="ucb", num_steps=3,
                         num_init=8, grid_size=8, fit_iters=10, seed=0,
                         verbose=False, checkpoint_path=ckpt)
    second = run_bayesopt(function="Ackley", dim=2, acqf="ucb", num_steps=3,
                          num_init=8, grid_size=8, fit_iters=10, seed=0,
                          verbose=False, resume_from=ckpt)
    # resumed trajectory starts from the saved one
    assert second["best_per_step"][: len(first["best_per_step"])] == first["best_per_step"]
    assert len(second["best_per_step"]) == len(first["best_per_step"]) + 3
    # best-so-far never regresses across the resume boundary
    bps = second["best_per_step"]
    assert all(b2 >= b1 - 1e-9 for b1, b2 in zip(bps, bps[1:]))

    with pytest.raises(ValueError, match="dim"):
        run_bayesopt(function="Ackley", dim=3, acqf="ucb", num_steps=1,
                     num_init=4, grid_size=8, fit_iters=5, seed=0,
                     verbose=False, resume_from=ckpt)


@pytest.mark.slow
def test_qmves_joint_sampler_vs_gumbel(wiski_posterior):
    """The joint max-value sampler prices cross-candidate covariance: on a
    candidate set of N COPIES of one point the true max-value distribution
    is the single-point marginal, while the product-of-marginal-CDFs
    Gumbel fit overstates the max (as if the N copies were independent).
    Overstated y* -> smaller truncated-normal gain, so the joint form must
    report strictly more information gain on the duplicated set."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(11)
    dup_cand = jnp.tile(jnp.asarray([[0.4, -0.3]]), (32, 1))
    xq = jnp.asarray([[0.35, -0.25]])
    v_joint = float(acq.q_max_value_entropy(
        model, params, state, xq, dup_cand, key, num_max_samples=64,
        max_value_method="joint"))
    v_gumbel = float(acq.q_max_value_entropy(
        model, params, state, xq, dup_cand, key, num_max_samples=64,
        max_value_method="gumbel"))
    assert np.isfinite(v_joint) and np.isfinite(v_gumbel)
    assert v_joint > v_gumbel  # marginal fit overstates y* -> understates gain

    # joint sampler stays differentiable w.r.t. the query
    g = jax.grad(lambda X: acq.q_max_value_entropy(
        model, params, state, X, dup_cand, key, num_max_samples=16,
        max_value_method="joint"))(xq)
    assert bool(jnp.isfinite(g).all())


@pytest.mark.slow
def test_qkg_multistart_dominates_single_start(wiski_posterior):
    """Multi-start inner maximization includes the single-start seed, so
    its value can only match or beat the single-start lookahead
    (VERDICT r2 item 4)."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(12)
    disc = jax.random.uniform(key, (12, 2), minval=-1, maxval=1)
    cand = jnp.asarray([[0.25, 0.15]])
    kwargs = dict(num_fantasies=4, lookahead_steps=15)
    kg_single = acq.q_knowledge_gradient(
        model, params, state, cand, disc, jnp.asarray(0.5), key,
        num_inner_restarts=1, **kwargs)
    kg_multi = acq.q_knowledge_gradient(
        model, params, state, cand, disc, jnp.asarray(0.5), key,
        num_inner_restarts=4, **kwargs)
    assert np.isfinite(float(kg_multi))
    assert float(kg_multi) >= float(kg_single) - 1e-6


def test_lbfgs_fit_beats_adam_at_same_budget(wiski_posterior):
    """The BO loop's optional L-BFGS refit (reference
    ``fit_gpytorch_model``'s optimizer class) must reach a lower MLL loss
    than Adam at the same step budget on a fixed posterior fixture
    (VERDICT r2 item 10)."""
    from online_gp_tpu.config import SolverConfig
    from online_gp_tpu.bayesopt.loop import make_fit_fn

    model, params, state, x = wiski_posterior
    cfg = SolverConfig()
    losses = {}
    for method in ("adam", "lbfgs"):
        opt, fit = make_fit_fn(model, cfg, method, fit_iters=20, fit_lr=0.05)
        p, _, last = fit(params, state, opt.init(params))
        from online_gp_tpu.models.wiski import wiski_mll
        losses[method] = float(-jnp.sum(wiski_mll(model, p, state, cfg)))
        assert np.isfinite(losses[method]), method
    assert losses["lbfgs"] <= losses["adam"] + 1e-6


@pytest.mark.slow
def test_bayesopt_lbfgs_loop_and_checkpoint(tmp_path):
    """End-to-end lbfgs BO arm runs, improves, and persists a restorable
    final surrogate (params + caches + queried data)."""
    jax.config.update("jax_platforms", "cpu")
    from online_gp_tpu.bayesopt.loop import run_bayesopt
    from online_gp_tpu.utils.checkpoint import load_pytree

    ckpt = str(tmp_path / "bo_final")
    out = run_bayesopt(function="Ackley", dim=2, acqf="ucb", num_steps=4, num_init=8,
                       grid_size=8, fit_iters=15, seed=0, verbose=False,
                       fit_method="lbfgs", checkpoint_path=ckpt)
    assert out["best_per_step"][-1] >= out["best_per_step"][0]

    blob = load_pytree(ckpt)
    assert set(blob) >= {"params", "state", "train_u", "train_y", "surrogate"}
    # the restored surrogate predicts finitely at the queried points,
    # rebuilt through the loop's own surrogate spec
    from online_gp_tpu.bayesopt.loop import _make_surrogate
    from online_gp_tpu.models.wiski import wiski_predict

    model, _ = _make_surrogate(str(blob["surrogate"]), 2, 8, 0.1)
    mean, var = wiski_predict(model, blob["params"], blob["state"], blob["train_u"])
    assert bool(jnp.isfinite(mean).all() & jnp.isfinite(var).all())


@pytest.mark.slow
def test_qmves_qbatch_discounts_correlated_candidates(wiski_posterior):
    """q>1 MVES uses the sequential fantasy decomposition (botorch's
    qMaxValueEntropy strategy): a duplicated candidate must add far less
    gain than a distant informative one, and the q=1 path is unchanged."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(7)
    cand = jax.random.uniform(jax.random.PRNGKey(8), (64, 2), minval=-1, maxval=1)

    xa = jnp.asarray([[0.55, 0.55]])
    xb = jnp.asarray([[-0.6, -0.6]])
    # near-noiseless fantasies: a repeat observation is then worthless
    mves = lambda X: acq.q_max_value_entropy(
        model, params, state, X, cand, key, noise_value=1e-3)
    va = float(mves(xa))
    vb = float(mves(xb))
    assert va > 0 and vb > 0

    v_dup = float(mves(jnp.concatenate([xa, xa])))
    v_two = float(mves(jnp.concatenate([xa, xb])))
    # the duplicate's conditional gain mostly collapses (residual set by
    # the grid's interpolation resolution and the fantasy-noise floor);
    # the marginal form would give exactly 2x
    assert v_dup < va + 0.5 * va
    # joint MES is NOT additive (xa sits near the optimum, so its
    # fantasies raise y* and shrink everyone else's gain) but per-point
    # gains are nonnegative: the batch is at least its first point
    assert v_two >= va - 1e-6
    assert v_dup >= va - 1e-6

    g = jax.grad(lambda X: acq.q_max_value_entropy(
        model, params, state, X, cand, key, noise_value=1e-3))(jnp.concatenate([xa, xb]))
    assert jnp.all(jnp.isfinite(g)) and float(jnp.abs(g).max()) > 0


def test_optimize_acqf_lbfgs_method():
    """L-BFGS restarts (botorch's optimizer class for optimize_acqf) hit
    the concave optimum at least as precisely as Adam, in fewer steps."""
    target = jnp.asarray([0.3, -0.2])
    acqf = lambda X: -jnp.sum((X - target) ** 2)
    bounds = jnp.asarray([[-1.0, 1.0], [-1.0, 1.0]])
    x_l, v_l = optimize_acqf(acqf, bounds, q=1, num_restarts=4, raw_samples=16,
                             maxiter=60, method="lbfgs")
    np.testing.assert_allclose(np.asarray(x_l[0]), np.asarray(target), atol=0.02)
    x_a, v_a = optimize_acqf(acqf, bounds, q=1, num_restarts=4, raw_samples=16,
                             maxiter=60, lr=0.1, method="adam")
    assert float(v_l) >= float(v_a) - 1e-6

    with pytest.raises(ValueError, match="unknown method"):
        optimize_acqf(acqf, bounds, q=1, method="sgd")


def test_qei_analytic_q1_matches_mc(wiski_posterior):
    """The q=1 analytic EI branch equals the MC q-batch estimator's
    expectation: a 2-point q-batch of the SAME candidate has the same EI
    as the single candidate (max over identical coordinates), so the MC
    path at q=2-duplicated must agree with the analytic q=1 value."""
    model, params, state, x = wiski_posterior
    key = jax.random.PRNGKey(4)
    cand = jnp.asarray([[0.45, -0.2]])
    best = jnp.asarray(0.3)
    analytic = float(acq.q_expected_improvement(model, params, state, cand, best, key))
    mc_dup = float(acq.q_expected_improvement(
        model, params, state, jnp.tile(cand, (2, 1)), best, key, num_samples=8192
    ))
    assert analytic >= 0.0
    np.testing.assert_allclose(mc_dup, analytic, rtol=0.1, atol=5e-4)
