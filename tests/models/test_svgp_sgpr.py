"""Core-level tests for the O-SVGP and O-SGPR model families."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.models.svgp import (
    SVGPModel,
    svgp_predict,
    svgp_elbo,
    svgp_kl_to_prior,
    svgp_snapshot,
    svgp_streaming_correction,
    svgp_closed_form_update,
    svgp_init_variational_to_prior,
)
from online_gp_tpu.models.sgpr import (
    SGPRModel,
    sgpr_bound,
    sgpr_absorb,
    sgpr_predict,
    sgpr_resample_z,
)

DT = jnp.float32


def _sine_data(n=200, noise=0.1, seed=0):
    kx, ky = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.uniform(kx, (n, 1), minval=-1.0, maxval=1.0, dtype=DT)
    y = jnp.sin(3 * x[:, 0]) + noise * jax.random.normal(ky, (n,), dtype=DT)
    return x, y


class TestSVGP:
    def _trained(self, steps=400):
        x, y = _sine_data()
        model = SVGPModel(RBFKernel())
        z = jnp.linspace(-1, 1, 16, dtype=DT)[:, None]
        params = svgp_init_variational_to_prior(model, model.init_params(z, 1, lengthscale=0.4))
        g = jax.jit(jax.grad(lambda p: -svgp_elbo(model, p, x, y, x.shape[0], 1.0)))
        opt = optax.adam(0.05)
        os_ = opt.init(params)
        for _ in range(steps):
            up, os_ = opt.update(g(params), os_, params)
            params = optax.apply_updates(params, up)
        return model, params, x, y

    @pytest.mark.slow
    def test_elbo_training_fits(self):
        model, params, x, y = self._trained()
        mean, var = svgp_predict(model, params, x)
        rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
        assert rmse < 0.15
        assert float(svgp_kl_to_prior(model, params)) > 0

    def test_prior_init_kl_zero(self):
        model = SVGPModel(RBFKernel())
        z = jnp.linspace(-1, 1, 12, dtype=DT)[:, None]
        params = svgp_init_variational_to_prior(model, model.init_params(z, 1))
        assert abs(float(svgp_kl_to_prior(model, params))) < 1e-2

    def test_streaming_correction_finite_and_zero_selfkl(self):
        model, params, x, y = self._trained(steps=100)
        old = svgp_snapshot(model, params)
        corr = svgp_streaming_correction(model, params, old, 1, 1.0)
        assert bool(jnp.isfinite(corr))

    def test_closed_form_update_stable(self):
        model, params, x, y = self._trained()
        mean0, _ = svgp_predict(model, params, x)
        rmse0 = float(jnp.sqrt(jnp.mean((mean0 - y) ** 2)))
        x2, y2 = _sine_data(n=20, seed=7)
        new_params = svgp_closed_form_update(model, params, x2, y2)
        assert bool(jnp.isfinite(new_params["var_mean"]).all())
        assert bool(jnp.isfinite(new_params["var_chol"]).all())
        mean1, _ = svgp_predict(model, new_params, x)
        rmse1 = float(jnp.sqrt(jnp.mean((mean1 - y) ** 2)))
        assert rmse1 < rmse0 + 0.05  # absorbing consistent data shouldn't hurt


class TestSGPR:
    def _trained(self):
        x, y = _sine_data(n=300)
        model = SGPRModel(RBFKernel())
        z = jnp.linspace(-1, 1, 16, dtype=DT)[:, None]
        params = model.init_params(z, 1, lengthscale=0.4)
        g = jax.jit(jax.grad(lambda p: -sgpr_bound(model, p, None, x[:150], y[:150])))
        opt = optax.adam(0.05)
        os_ = opt.init(params)
        for _ in range(300):
            up, os_ = opt.update(g(params), os_, params)
            params = optax.apply_updates(params, up)
        return model, params, x, y

    @pytest.mark.slow
    def test_bound_fit_and_absorb(self):
        model, params, x, y = self._trained()
        params, old, mo = sgpr_absorb(model, params, None, None, x[:150], y[:150])
        mean, var = sgpr_predict(model, params, mo, x)
        assert float(jnp.sqrt(jnp.mean((mean - y) ** 2))) < 0.2
        assert bool((var > 0).all())

    @pytest.mark.slow
    def test_exact_stream_no_leak(self):
        model, params, x, y = self._trained()
        params, old, mo = sgpr_absorb(model, params, None, None, x[:150], y[:150])
        mean, _ = sgpr_predict(model, params, mo, x)
        base = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
        for t in range(150, 300):
            params, old, mo = sgpr_absorb(
                model, params, old, mo, x[t : t + 1], y[t : t + 1], rebase=False
            )
        mean, _ = sgpr_predict(model, params, mo, x)
        streamed = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
        assert streamed < base + 0.03  # 150 single-point absorbs, no drift

    @pytest.mark.slow
    def test_stream_matches_batch(self):
        model, params, x, y = self._trained()
        p1, o1, m1 = sgpr_absorb(model, params, None, None, x, y)
        p2, o2, m2 = sgpr_absorb(model, params, None, None, x[:150], y[:150])
        for s in range(150, 300, 30):
            p2, o2, m2 = sgpr_absorb(model, p2, o2, m2, x[s : s + 30], y[s : s + 30], rebase=False)
        mean1, _ = sgpr_predict(model, p1, m1, x)
        mean2, _ = sgpr_predict(model, p2, m2, x)
        np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), atol=5e-3)

    def test_resample_z_moves_points(self):
        model, params, x, y = self._trained()
        z_new = sgpr_resample_z(params, x[:50], 0.25, jax.random.PRNGKey(0))
        assert z_new.shape == params["z"].shape
        moved = int(jnp.sum(jnp.any(jnp.abs(z_new - params["z"]) > 1e-3, axis=-1)))
        assert moved >= 3  # 25% of 16

    @pytest.mark.slow
    def test_bound_uses_old_state(self):
        model, params, x, y = self._trained()
        params, old, mo = sgpr_absorb(model, params, None, None, x[:150], y[:150])
        v_first = sgpr_bound(model, params, None, x[150:200], y[150:200])
        v_stream = sgpr_bound(model, params, old, x[150:200], y[150:200])
        assert not np.allclose(float(v_first), float(v_stream))
        assert np.isfinite(float(v_stream))


class TestExactEstep:
    @pytest.mark.slow
    def test_estep_is_elbo_optimal(self):
        """svgp_exact_estep lands on the collapsed-posterior optimum: its
        ELBO dominates the prior init AND a 200-step gradient-trained
        q(u) at the same hypers (E-step optimality in (m, S))."""
        from online_gp_tpu.models.svgp import svgp_exact_estep

        x, y = _sine_data(n=120)
        model = SVGPModel(RBFKernel())
        z = jnp.linspace(-1, 1, 12, dtype=DT)[:, None]
        params0 = svgp_init_variational_to_prior(
            model, model.init_params(z, 1, lengthscale=0.4)
        )
        elbo = lambda p: float(svgp_elbo(model, p, x, y, x.shape[0], 1.0))

        star = svgp_exact_estep(model, params0, x, y)
        assert elbo(star) > elbo(params0)

        # gradient ascent on (var_mean, var_chol) only, hypers frozen
        g = jax.jit(jax.grad(lambda p: -svgp_elbo(model, p, x, y, x.shape[0], 1.0)))
        opt = optax.adam(0.05)
        os_ = opt.init(params0)
        p = dict(params0)
        for _ in range(200):
            grads = g(p)
            grads = {
                k: (v if k in ("var_mean", "var_chol")
                    else jax.tree.map(jnp.zeros_like, v))
                for k, v in grads.items()
            }
            up, os_ = opt.update(grads, os_, p)
            p = optax.apply_updates(p, up)
        assert elbo(star) >= elbo(p) - 1e-3

    @pytest.mark.slow
    def test_estep_matches_bui_update_from_prior(self):
        """From a prior-reset q(a) the Bui pseudo-observation update and
        the direct collapsed form compute the same optimum."""
        from online_gp_tpu.models.svgp import svgp_exact_estep

        x, y = _sine_data(n=60)
        model = SVGPModel(RBFKernel())
        z = jnp.linspace(-1, 1, 10, dtype=DT)[:, None]
        params0 = svgp_init_variational_to_prior(
            model, model.init_params(z, 1, lengthscale=0.4)
        )
        a = svgp_exact_estep(model, params0, x, y)
        b = svgp_closed_form_update(model, params0, x, y)
        np.testing.assert_allclose(
            np.asarray(a["var_mean"]), np.asarray(b["var_mean"]), atol=5e-3
        )
        Sa = a["var_chol"] @ a["var_chol"].T
        Sb = b["var_chol"] @ b["var_chol"].T
        np.testing.assert_allclose(np.asarray(Sa), np.asarray(Sb), atol=5e-3)

    @pytest.mark.slow
    def test_closed_form_fit_recovers_small_init(self):
        """variational_mode='closed_form' fit succeeds where the same-budget
        pure-gradient fit stalls: 150 points, 30 epochs (the online
        wrapper's pretrain regime that motivated the EM mode)."""
        from online_gp_tpu.api.svgp import OnlineSVGPRegression
        from online_gp_tpu.api.stems import IdentityStem

        kx, ky = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.uniform(kx, (150, 2), minval=-1, maxval=1, dtype=DT)
        y = jnp.sin(3 * x[:, 0]) * jnp.cos(2 * x[:, 1])
        y = (y + 0.05 * jax.random.normal(ky, y.shape, dtype=DT))[:, None]
        x_np, y_np = np.asarray(x), np.asarray(y)

        em = OnlineSVGPRegression(IdentityStem(2), x_np, y_np, num_inducing=32,
                                  lr=0.05, variational_mode="closed_form", seed=0)
        em.fit(x_np, y_np, num_epochs=30)
        rmse_em, _ = em.evaluate(x_np, y_np)

        grad = OnlineSVGPRegression(IdentityStem(2), x_np, y_np, num_inducing=32,
                                    lr=0.05, seed=0)
        grad.fit(x_np, y_np, num_epochs=30)
        rmse_grad, _ = grad.evaluate(x_np, y_np)

        assert rmse_em < 0.3, f"EM fit rmse {rmse_em}"
        assert rmse_em <= rmse_grad + 1e-6, (rmse_em, rmse_grad)

    @pytest.mark.slow
    def test_snapshot_indefinite_gram_streaming_finite(self):
        """Regression: an f32 RBF gram over clustered inducing points can be
        numerically indefinite (~-1e-5 eigenvalues); svgp_snapshot must
        floor prior_cov so the first online streaming correction stays
        finite (observed as immediate NaN on the quality-suite stream under
        variational_mode='closed_form')."""
        from online_gp_tpu.models.svgp import svgp_exact_estep

        key = jax.random.PRNGKey(7)
        # 96 inducing points in 3 tight clusters -> near-singular Kzz whose
        # f32 eigenvalues dip below zero
        centers = jnp.asarray([[-0.5, 0.0], [0.4, 0.3], [0.1, -0.6]], dtype=DT)
        z = (centers[jnp.arange(96) % 3]
             + 1e-3 * jax.random.normal(key, (96, 2), dtype=DT))
        model = SVGPModel(RBFKernel())
        params = svgp_init_variational_to_prior(
            model, model.init_params(z, 2, lengthscale=1.0)
        )
        kx, ky = jax.random.split(key)
        x = jax.random.uniform(kx, (64, 2), minval=-1, maxval=1, dtype=DT)
        y = jnp.sin(2 * x[:, 0]) + 0.05 * jax.random.normal(ky, (64,), dtype=DT)
        # collapse q(u) with the exact E-step (the regime that exposed it)
        params = svgp_exact_estep(model, params, x, y)
        old = svgp_snapshot(model, params)
        assert float(jnp.linalg.eigvalsh(old.prior_cov).min()) > 0.0
        assert float(jnp.linalg.eigvalsh(old.var_cov).min()) > 0.0
        new_params = svgp_closed_form_update(model, params, x[:1], y[:1])
        corr = svgp_streaming_correction(model, new_params, old, 1, 1e-3)
        assert bool(jnp.isfinite(corr)), float(corr)

    @pytest.mark.slow
    def test_streaming_correction_singular_projected_cov(self):
        """Regression: the Bui correction must never factorize q_new's
        projected covariance S0 — after a closed-form E-step S0 is
        numerically singular past any jitter and chol(S0) NaNs the
        correction VALUE on TPU (difference form cancels -logdet S0)."""
        x, y = _sine_data(64)
        model = SVGPModel(RBFKernel())
        z = x[:32]
        params = svgp_init_variational_to_prior(
            model, model.init_params(z, 1, lengthscale=0.5)
        )
        old = svgp_snapshot(model, params)
        # collapse q(u) to (numerically) zero posterior variance: S0 at
        # old.z is then singular far past what jitter escalation covers
        params["var_chol"] = 1e-6 * jnp.eye(32, dtype=DT)

        def corr(p):
            return svgp_streaming_correction(model, p, old, 4, 1.0)

        val, grad = jax.value_and_grad(corr)(params)
        assert bool(jnp.isfinite(val)), float(val)
        for k, g in grad.items():
            for leaf in jax.tree.leaves(g):
                assert bool(jnp.isfinite(leaf).all()), k


class TestOnlineStepGuards:
    """The online-update robustness guards added after the round-5
    showdown (3 of 6 on-chip svgp arms lost their posterior to one
    non-finite f32 gradient; CPU identical program healthy)."""

    def test_zero_nans_skips_poisoned_leaf_keeps_healthy(self):
        """A non-finite gradient leaf must become a no-op for that leaf
        while finite leaves still step (api.svgp._make_optimizer)."""
        import optax
        from online_gp_tpu.api.svgp import _make_optimizer

        opt = _make_optimizer(0.01)
        params = {
            "z": jnp.ones((4, 2), DT),
            "var_mean": jnp.zeros((4,), DT),
            "var_chol": jnp.eye(4, dtype=DT),
            "kernel": {"raw_lengthscale": jnp.zeros((1, 2), DT),
                       "raw_outputscale": jnp.zeros((), DT)},
            "raw_noise": jnp.zeros((), DT),
        }
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        grads["var_mean"] = jnp.full_like(grads["var_mean"], jnp.nan)
        up, _ = opt.update(grads, state, params)
        new = optax.apply_updates(params, up)
        for leaf in jax.tree.leaves(new):
            assert bool(jnp.isfinite(leaf).all())
        # the poisoned leaf did not move; a healthy leaf did
        assert bool((new["var_mean"] == params["var_mean"]).all())
        assert not bool((new["raw_noise"] == params["raw_noise"]).all())

    def test_gaussian_ell_noise_floor(self):
        """exp(raw_noise) underflow must not turn the expected
        log-likelihood (or its gradient) non-finite."""
        from online_gp_tpu.models.svgp import gaussian_expected_log_prob

        y = jnp.asarray([0.5], DT)
        mean = jnp.asarray([0.4], DT)
        var = jnp.asarray([0.1], DT)

        def ell(raw_noise):
            return jnp.sum(
                gaussian_expected_log_prob(y, mean, var, jnp.exp(raw_noise))
            )

        v, g = jax.value_and_grad(ell)(jnp.asarray(-200.0, DT))  # exp -> 0 in f32
        assert bool(jnp.isfinite(v))
        assert bool(jnp.isfinite(g))
