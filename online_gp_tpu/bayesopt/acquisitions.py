"""Monte-Carlo acquisition functions over WISKI posteriors.

The reference gets qEI / qNEI / qUCB / qKG / qMVES from botorch
(``experiments/bayesopt/utils.py:74-103``) and qNIPV from
``botorch.acquisition.active_learning`` (``qnIPV_experiment.py:29``).
TPU-native equivalents: every acquisition is a pure differentiable
function of the q candidate points, built on

- joint posterior samples  f = mean + R eps  with the grid-space
  covariance root R = W_x chol(cov_cache)  (``wiski_predict_root``), and
- the O(m^2) fantasy conditioning path for lookahead acquisitions
  (``wiski_condition`` — variance reduction is y-independent).

All use fixed base samples (the reference's IID/Sobol ``sampler`` with a
fixed seed), so acquisition optimization is deterministic under jit/grad.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.models.wiski import (
    WiskiModel,
    WiskiState,
    wiski_predict,
    wiski_predict_root,
    wiski_condition,
)


def _joint_samples(model, params, state, x, key, num_samples, cfg):
    """(S, n) joint posterior samples at candidate points (output 0)."""
    mean, root = wiski_predict_root(model, params, state, x, cfg)  # (B,n),(B,n,m)
    eps = jax.random.normal(key, (num_samples, root.shape[-1]), mean.dtype)
    return mean[0][None, :] + eps @ root[0].T  # (S, n)


def q_expected_improvement(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    best_f: jnp.ndarray, key, num_samples: int = 256, cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """qEI(X) = E[max_j relu(f(x_j) - best_f)].

    At q = 1 the analytic form sigma*(z*Phi(z) + phi(z)) is returned — the
    MC estimator's exact expectation (same shortcut as qUCB's q=1 branch):
    it needs only the marginal (mean, var), not the joint covariance root,
    so the acquisition gradient avoids dragging an m x m Cholesky through
    the multi-restart optimizer."""
    if x.shape[0] == 1:
        mean, var = wiski_predict(model, params, state, x, cfg)
        sigma = jnp.sqrt(jnp.maximum(var[0, 0], 1e-12))
        z = (mean[0, 0] - best_f) / sigma
        phi = jnp.exp(-0.5 * z * z) / jnp.sqrt(2.0 * jnp.pi)
        Phi = 0.5 * (1.0 + jax.scipy.special.erf(z / jnp.sqrt(2.0)))
        return sigma * (z * Phi + phi)
    f = _joint_samples(model, params, state, x, key, num_samples, cfg)
    return jnp.mean(jnp.max(jax.nn.relu(f - best_f), axis=-1))


def q_upper_confidence_bound(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    beta: float, key=None, num_samples: int = 256,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """qUCB(X) = E[max_j (mu_j + sqrt(beta*pi/2) |f_j - mu_j|)] — botorch's
    MC q-batch form (``qUpperConfidenceBound``; the reference builds it at
    ``experiments/bayesopt/utils.py:81``) over *joint* posterior samples,
    so candidate correlations are priced in for q > 1.

    At q = 1 the analytic form mu + sqrt(beta)*sigma is returned (the MC
    estimator's exact expectation, since E|z| = sqrt(2/pi)); this keeps the
    single-candidate path deterministic and sampler-free.
    """
    q = x.shape[0]
    if q == 1:
        mean, var = wiski_predict(model, params, state, x, cfg)
        return jnp.max(mean[0] + jnp.sqrt(beta * jnp.maximum(var[0], 1e-12)))
    if key is None:
        # a silent fixed-seed default would correlate the acquisition noise
        # across every BO step that omits the key
        raise ValueError(
            "q_upper_confidence_bound with q > 1 is a MC estimator and "
            "requires an explicit PRNG key"
        )
    mean, root = wiski_predict_root(model, params, state, x, cfg)  # (B,q),(B,q,k)
    eps = jax.random.normal(key, (num_samples, root.shape[-1]), mean.dtype)
    dev = eps @ root[0].T  # (S, q) zero-mean joint deviations
    beta_prime = jnp.sqrt(beta * jnp.pi / 2.0)
    ucb = mean[0][None, :] + beta_prime * jnp.abs(dev)
    return jnp.mean(jnp.max(ucb, axis=-1))


def q_noisy_expected_improvement(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    x_baseline: jnp.ndarray, key, num_samples: int = 256, cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """qNEI(X) = E[max f(X) - max f(X_baseline)]_+ over joint samples."""
    q = x.shape[0]
    joint = jnp.concatenate([x, x_baseline], axis=0)
    f = _joint_samples(model, params, state, joint, key, num_samples, cfg)
    new_max = jnp.max(f[:, :q], axis=-1)
    base_max = jnp.max(f[:, q:], axis=-1)
    return jnp.mean(jax.nn.relu(new_max - base_max))


def q_knowledge_gradient(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    x_discrete: jnp.ndarray, current_best: jnp.ndarray, key,
    num_fantasies: int = 16, cfg: SolverConfig = DEFAULT_CONFIG,
    lookahead_steps: int = 20, lookahead_lr: float = 0.05,
    num_inner_restarts: int = 4,
) -> jnp.ndarray:
    """One-step lookahead KG: sample fantasy observations at X, condition
    the caches (O(m^2) per fantasy), and average the max posterior mean
    gain. The inner maximization seeds from the best discrete candidate
    and then runs ``lookahead_steps`` of projected gradient ascent on the
    fantasy posterior mean — optimized lookahead like botorch's
    ``qKnowledgeGradient`` (reference ``experiments/bayesopt/utils.py:88-93``),
    not a fixed-grid max. Set ``lookahead_steps=0`` for the grid-only form.

    Outer gradients (w.r.t. X) stay exact: by the envelope theorem the
    sensitivity of the inner max to its argmax location vanishes at the
    optimum, so the optimized location is wrapped in stop_gradient and the
    X-gradient flows purely through the fantasy-conditioned caches.

    The inner maximization is MULTI-START: ascent runs from the
    ``num_inner_restarts`` best discrete candidates in parallel (vmapped)
    and the best endpoint wins — the single-start form can stall on a
    local ridge of the fantasy mean and under-estimate KG (botorch's
    ``qKnowledgeGradient`` likewise multi-starts its inner problem via
    ``optimize_acqf``'s restart machinery)."""
    fant_y = _joint_samples(model, params, state, x, key, num_fantasies, cfg)  # (F, q)
    cfg_mean = cfg.replace(skip_posterior_variances=True)
    lo = jnp.min(x_discrete, axis=0)
    hi = jnp.max(x_discrete, axis=0)

    def one_fantasy(yf):
        noise = jnp.ones((x.shape[0], model.num_outputs), x.dtype)
        # detach_interp=False: the acquisition is optimized by gradient
        # ascent on x, and the variance-reduction channel (x's interp
        # weights entering the root/wty update) must stay differentiable
        # — same reasoning as qNIPV. Also keeps this vmapped call off the
        # non-differentiable Pallas path.
        st = wiski_condition(model, state, x, yf[:, None], noise, detach_interp=False)
        m, _ = wiski_predict(model, params, st, x_discrete, cfg_mean)

        if lookahead_steps > 0:
            k = min(num_inner_restarts, x_discrete.shape[0])
            seeds = x_discrete[jax.lax.top_k(m[0], k)[1]]  # (k, d)
            # inner ascent on the fantasy mean; the fantasy state is
            # detached here (envelope theorem: only the *location* is
            # being optimized) and re-attached for the final value.
            st_sg = jax.tree.map(
                lambda a: None if a is None else jax.lax.stop_gradient(a), st
            )

            def mean_at(xx, s):
                mm, _ = wiski_predict(model, params, s, xx[None], cfg_mean)
                return mm[0, 0]

            def ascend_from(x0):
                def ascend(_, xx):
                    g = jax.grad(mean_at)(xx, st_sg)
                    return jnp.clip(xx + lookahead_lr * g, lo, hi)

                return jax.lax.fori_loop(0, lookahead_steps, ascend, x0)

            x_stars = jax.lax.stop_gradient(jax.vmap(ascend_from)(seeds))  # (k, d)
            vals = jax.vmap(lambda xx: mean_at(xx, st))(x_stars)
            # never move below the best discrete seed's value
            return jnp.maximum(jnp.max(vals), jnp.max(m[0]))
        return jnp.max(m[0])

    vals = jax.vmap(one_fantasy)(fant_y)
    return jnp.mean(vals) - current_best


def q_max_value_entropy(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    candidate_set: jnp.ndarray, key, num_max_samples: int = 16,
    cfg: SolverConfig = DEFAULT_CONFIG, num_fantasies: int = 8,
    noise_value: float = 1.0, max_value_method: str = "joint",
) -> jnp.ndarray:
    """qMVES — max-value entropy search (the reference uses botorch's
    ``qMaxValueEntropy``, ``experiments/bayesopt/utils.py:96-101``).

    Max-values y* are sampled from the posterior of max_i f(s_i) over the
    candidate set; the information gain at x is the truncated-normal
    entropy-difference formula
      a(x) = E_{y*}[ gamma phi(gamma) / (2 Phi(gamma)) - log Phi(gamma) ],
      gamma = (y* - mu(x)) / sigma(x).

    ``max_value_method`` selects the y* sampler:

    - ``"joint"`` (default, the reference's): draw ``num_max_samples``
      JOINT posterior samples over the candidate set (mean + R eps with
      the grid-space covariance root from ``wiski_predict_root``) and take
      each draw's max — candidate correlations shape the max-value
      distribution exactly, where the product-of-marginal-CDFs fit
      overstates the max when candidates are correlated.
    - ``"gumbel"``: Wang & Jegelka (2017) approximation — fit a Gumbel to
      the product of marginal CDFs at the 0.25/0.5/0.75 quantiles and
      sample from it. Cheaper (no m-dim root draw) but marginal-only.

    For q > 1 the joint gain is priced with the sequential decomposition
    botorch's ``qMaxValueEntropy`` uses (fantasization): the batch value is
    sum_j E[gain(x_j | fantasy observations at x_<j)], with joint fantasy
    draws from the current posterior and O(m^2) cache conditioning per
    fantasy — so duplicated/correlated candidates stop double-counting
    (their conditional variance, hence gain, collapses). ``noise_value``
    is the fantasy observation noise — pass the model's noise level;
    redundancy is only priced relative to it (two observations of the
    same point genuinely do carry ~2x the information when the noise
    dwarfs the posterior variance).
    """
    key, k_fant = jax.random.split(key)
    if max_value_method == "joint":
        # exact max-value sampler: max over joint posterior draws at the
        # candidate set (each draw prices every cross-candidate covariance)
        f_cand = _joint_samples(
            model, params, state, candidate_set, key, num_max_samples, cfg
        )  # (S, n_cand)
        y_star = jnp.max(f_cand, axis=-1)  # (S,)
    elif max_value_method == "gumbel":
        mean_c, var_c = wiski_predict(model, params, state, candidate_set, cfg)
        mu, sd = mean_c[0], jnp.sqrt(jnp.maximum(var_c[0], 1e-12))

        # Gumbel fit: match P(max <= y) ~= prod Phi((y-mu)/sd) at 0.25/0.5/0.75
        def cdf_max(y):
            return jnp.sum(jax.scipy.stats.norm.logcdf((y - mu) / sd))

        lo = jnp.min(mu - 5 * sd)
        hi = jnp.max(mu + 5 * sd)

        def quantile(p):
            def body(_, ab):
                a, b = ab
                mid = 0.5 * (a + b)
                below = cdf_max(mid) < jnp.log(p)
                return jnp.where(below, mid, a), jnp.where(below, b, mid)

            a, b = jax.lax.fori_loop(0, 30, body, (lo, hi))
            return 0.5 * (a + b)

        y25, y50, y75 = quantile(0.25), quantile(0.5), quantile(0.75)
        # Gumbel(loc, scale) from the quartiles
        b = jnp.maximum((y75 - y25) / (jnp.log(jnp.log(4.0)) - jnp.log(jnp.log(4.0 / 3.0))), 1e-6)
        a = y50 + b * jnp.log(jnp.log(2.0))
        u = jax.random.uniform(key, (num_max_samples,), minval=1e-4, maxval=1 - 1e-4)
        y_star = a - b * jnp.log(-jnp.log(u))  # (S,)
    else:
        raise ValueError(
            f"unknown max_value_method {max_value_method!r} (joint/gumbel)"
        )

    def gain_at(st, x_eval, ys):
        """E_{y*} truncated-normal information gain, summed over x_eval."""
        mean_x, var_x = wiski_predict(model, params, st, x_eval, cfg)
        mu_x, sd_x = mean_x[0], jnp.sqrt(jnp.maximum(var_x[0], 1e-12))
        gamma = (ys[:, None] - mu_x[None, :]) / sd_x[None, :]
        log_cdf = jax.scipy.stats.norm.logcdf(gamma)
        pdf = jnp.exp(jax.scipy.stats.norm.logpdf(gamma))
        gain = gamma * pdf / (2.0 * jnp.exp(log_cdf)) - log_cdf  # (S, q')
        return jnp.sum(jnp.mean(gain, axis=0))

    q = x.shape[0]
    if q == 1:
        return gain_at(state, x, y_star)

    # sequential fantasy decomposition: joint posterior draws at all q
    # candidates double as the sequential fantasy observations. States are
    # conditioned INCREMENTALLY (one point per scan step, carried per
    # fantasy) — identical posteriors to conditioning each prefix jointly,
    # at O(F q m^2) with a single traced conditioning.
    fant_y = _joint_samples(model, params, state, x, k_fant, num_fantasies, cfg)
    noise1 = jnp.full((1, model.num_outputs), noise_value, x.dtype)

    def cond_one(st, xj, yj):
        return wiski_condition(
            model, st, xj[None], yj[None, None], noise1, detach_interp=False
        )

    def scan_body(carry, j):
        sts, run_max = carry  # per-fantasy states; running max of fantasies
        xj = jax.lax.dynamic_slice_in_dim(x, j - 1, 1, axis=0)[0]
        yj = jax.lax.dynamic_slice_in_dim(fant_y, j - 1, 1, axis=1)[:, 0]
        sts = jax.vmap(lambda st, yv: cond_one(st, xj, yv))(sts, yj)
        # the max is at least the fantasized f values already observed
        # (else gamma < 0 explodes the truncated-normal gain)
        run_max = jnp.maximum(run_max, yj)
        x_next = jax.lax.dynamic_slice_in_dim(x, j, 1, axis=0)
        gains = jax.vmap(
            lambda st, rm: gain_at(st, x_next, jnp.maximum(y_star, rm))
        )(sts, run_max)
        return (sts, run_max), jnp.mean(gains)

    sts0 = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (num_fantasies,) + a.shape), state
    )
    run_max0 = jnp.full((num_fantasies,), -jnp.inf, fant_y.dtype)
    _, step_gains = jax.lax.scan(scan_body, (sts0, run_max0), jnp.arange(1, q))
    return gain_at(state, x[:1], y_star) + jnp.sum(step_gains)


def q_negative_integrated_posterior_variance(
    model: WiskiModel, params: Dict, state: WiskiState, x: jnp.ndarray,
    mc_points: jnp.ndarray, cfg: SolverConfig = DEFAULT_CONFIG,
    noise_value: float = 1.0,
) -> jnp.ndarray:
    """qNIPV(X) = -mean_i Var[f(s_i) | D + X] — the active-learning
    acquisition (reference ``qnIPV_experiment.py:179-183``). The fantasy
    variance is y-independent, so one conditioning pass suffices."""
    q = x.shape[0]
    dummy_y = jnp.zeros((q, model.num_outputs), x.dtype)
    noise = jnp.full((q, model.num_outputs), noise_value, x.dtype)
    st = wiski_condition(model, state, x, dummy_y, noise, detach_interp=False)
    _, var = wiski_predict(model, params, st, mc_points, cfg)
    return -jnp.mean(var)
