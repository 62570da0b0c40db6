"""Bayesian-optimization loop: WISKI + MC acquisitions on test functions.

TPU re-build of ``experiments/bayesopt/bayesopt.py``: per step — refit
hypers on the Woodbury MLL from the carried caches, optimize the
acquisition with multi-restart Adam, evaluate the (noisy, standardized)
test function, and absorb the observation with an O(m^2) conditioning
(``bayesopt.py:180-247``; hyperparameters and caches persist across steps
exactly like the reference's ``initialize_model`` cache hand-off at
lines 86-97).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import make_kernel
from online_gp_tpu.kernels.priors import GammaPrior
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_mll,
)
from online_gp_tpu.bayesopt.test_functions import make_test_function
from online_gp_tpu.bayesopt import acquisitions as acq
from online_gp_tpu.bayesopt.optimize import optimize_acqf, sobol_raw_init


def make_fit_fn(model, cfg, fit_method: str, fit_iters: int, fit_lr: float):
    """Build the per-step hyper-refit: ``(opt, fit)`` where
    ``fit(params, state, opt_state) -> (params, opt_state, last_loss)``
    runs ``fit_iters`` optimizer steps on -sum(wiski_mll).

    ``"adam"`` is a fixed-count Adam scan; ``"lbfgs"`` is optax L-BFGS
    with zoom linesearch — the optimizer class of the reference's
    per-step ``fit_gpytorch_model`` L-BFGS-B refit
    (``experiments/bayesopt/bayesopt.py:187``), which typically reaches a
    lower loss at the same step budget."""
    if fit_method == "lbfgs":
        opt = optax.lbfgs()

        @jax.jit
        def fit(params, state, opt_state):
            # linesearch caches (value, grad) in the optimizer state with
            # the params' dtype — return the loss in that dtype so the
            # cached and freshly-computed branches type-match under x64
            loss_dtype = jnp.result_type(*jax.tree.leaves(params))

            def loss_fn(pp):
                return (-jnp.sum(wiski_mll(model, pp, state, cfg))).astype(loss_dtype)

            value_and_grad = optax.value_and_grad_from_state(loss_fn)

            def step(carry, _):
                p, os_ = carry
                loss, g = value_and_grad(p, state=os_)
                up, os_ = opt.update(g, os_, p, value=loss, grad=g, value_fn=loss_fn)
                return (optax.apply_updates(p, up), os_), loss

            (p, os_), losses = jax.lax.scan(step, (params, opt_state), None, length=fit_iters)
            return p, os_, losses[-1]
    elif fit_method == "adam":
        opt = optax.adam(fit_lr)

        @jax.jit
        def fit(params, state, opt_state):
            def step(carry, _):
                p, os_ = carry
                loss, g = jax.value_and_grad(lambda pp: -jnp.sum(wiski_mll(model, pp, state, cfg)))(p)
                up, os_ = opt.update(g, os_, p)
                return (optax.apply_updates(p, up), os_), loss

            (p, os_), losses = jax.lax.scan(step, (params, opt_state), None, length=fit_iters)
            return p, os_, losses[-1]
    else:
        raise ValueError(f"unknown fit_method {fit_method!r} (adam/lbfgs)")
    return opt, fit


def _normalize(x, bounds):
    """Raw function domain -> unit cube [0, 1]^d (reference
    ``initialize_random_data``/``optimize_acqf_and_get_observation``
    train the surrogate on the unit cube, ``bayesopt/utils.py:106-170``)."""
    return (x - bounds[:, 0]) / (bounds[:, 1] - bounds[:, 0])


def _denormalize(u, bounds):
    return bounds[:, 0] + u * (bounds[:, 1] - bounds[:, 0])


def _make_surrogate(surrogate: str, dim: int, grid_size: int, noise_std: float):
    """Surrogate spec -> (model, fixed-noise value per observation).

    ``"reference"`` matches the reference BO model: ScaleKernel(Matern-2.5
    with GammaPrior(3,6) lengthscale, Interval(1e-4,12)) with
    GammaPrior(2,0.15) / Interval(1e-4,12) outputscale, learnable second
    noise, and fixed per-point noise ``noise_std**2``
    (``experiments/bayesopt/bayesopt.py:62,66-75,216-217``; the Matern is
    the per-dimension product form — the grid-structured family SKI
    requires). ``"plain"`` is the pre-round-4 arm kept for the A/B:
    unconstrained RBF, no priors, unit fixed noise.
    """
    if surrogate == "reference":
        kernel = make_kernel("matern52").constrain(
            lengthscale_bounds=(1e-4, 12.0), outputscale_bounds=(1e-4, 12.0)
        )
        priors = (
            ("raw_lengthscale", GammaPrior(3.0, 6.0)),
            ("raw_outputscale", GammaPrior(2.0, 0.15)),
        )
        noise_value = noise_std**2
    elif surrogate == "plain":
        kernel = make_kernel("rbf")
        priors = None
        noise_value = 1.0
    else:
        raise ValueError(f"unknown surrogate {surrogate!r} (reference/plain)")
    grid = Grid.create([(-0.05, 1.05)] * dim, grid_size)
    model = WiskiModel(
        kernel, grid, num_outputs=1, learn_additional_noise=True, priors=priors
    )
    return model, noise_value


def run_bayesopt(
    function: str = "Ackley",
    dim: int = 3,
    acqf: str = "ucb",
    num_steps: int = 30,
    num_init: int = 10,
    batch_size: int = 1,
    grid_size: int = 10,
    noise_std: float = 0.1,
    fit_iters: int = 50,
    fit_lr: float = 0.05,
    fit_method: str = "adam",
    surrogate: str = "reference",
    seed: int = 0,
    cfg: SolverConfig = SolverConfig(use_toeplitz=True),
    logger=None,
    verbose: bool = True,
    checkpoint_path: Optional[str] = None,
    resume_from: Optional[str] = None,
) -> Dict:
    """Returns dict with best values per step and timing.

    ``fit_method`` selects the per-step hyper refit optimizer:
    ``"adam"`` (fixed-count Adam scan) or ``"lbfgs"`` (optax L-BFGS with
    zoom linesearch — the second-order optimizer class the reference's
    ``fit_gpytorch_model`` L-BFGS-B refit uses every BO step,
    ``experiments/bayesopt/bayesopt.py:187``; typically reaches a better
    MLL optimum at the same step budget).

    ``checkpoint_path`` (optional) persists the final surrogate — hypers,
    WISKI caches, and the queried data — via ``utils.checkpoint``
    (reference ``bayesopt.py:265-275`` ``torch.save``s the equivalent).
    ``resume_from`` warm-starts from such a checkpoint: the loop skips
    the random init and continues the campaign with the saved hypers,
    caches, queried points, and standardization constants (``function``/
    ``dim``/``grid_size``/``noise_std`` must match the saving run)."""
    fn = make_test_function(function, dim)
    key = jax.random.PRNGKey(seed)
    model, noise_value = _make_surrogate(surrogate, dim, grid_size, noise_std)

    if resume_from is not None:
        from online_gp_tpu.utils.checkpoint import load_pytree

        blob = load_pytree(resume_from)
        params, state = blob["params"], blob["state"]
        train_u, train_y = blob["train_u"], blob["train_y"]
        y_mean, y_std = blob["y_mean"], blob["y_std"]
        latent = blob["latent"]
        if train_u.shape[-1] != dim:
            raise ValueError(
                f"checkpoint dim {train_u.shape[-1]} != requested dim {dim}"
            )
        ckpt_surrogate = blob.get("surrogate", "plain")
        if str(ckpt_surrogate) != surrogate:
            raise ValueError(
                f"checkpoint surrogate {ckpt_surrogate!r} != requested {surrogate!r}"
            )
        key, _ = jax.random.split(jax.random.fold_in(key, train_u.shape[0]))
        best_per_step = [float(v) for v in np.asarray(blob["best_per_step"])]
    else:
        params = model.init_params(dim)
        key, k_init, k_noise = jax.random.split(key, 3)
        train_u = jax.random.uniform(k_init, (num_init, dim))  # unit cube
        train_x = _denormalize(train_u, fn.bounds)
        y, latent = fn.noisy(train_x, k_noise, noise_std)
        y_mean, y_std = jnp.mean(y), jnp.std(y) + 1e-6
        train_y = ((y - y_mean) / y_std)[:, None]

        state = wiski_init(model, train_u, train_y, noise_value * jnp.ones_like(train_y))
        best_per_step = [float(jnp.max(latent))]

    opt, fit = make_fit_fn(model, cfg, fit_method, fit_iters, fit_lr)

    # ONE jitted acquisition-optimization program per campaign: per-step
    # quantities (beta / best_f / baseline / discretization / PRNG keys /
    # Sobol starts) enter as traced arguments with fixed shapes, so the
    # compile happens once instead of once per BO step (the reference
    # rebuilds its botorch acqf object per step, ``bayesopt.py:193``, but
    # torch has no retrace cost; under XLA a per-step closure would).
    unit_bounds = jnp.asarray([[0.0, 1.0]] * dim, jnp.float32)
    acq_restarts, acq_raw, acq_maxiter = 8, 32, 100
    nei_baseline_size = 64

    def _opt(fn, k_acq, raw):
        return optimize_acqf(fn, unit_bounds, q=batch_size, num_restarts=acq_restarts,
                             raw_samples=acq_raw, maxiter=acq_maxiter, key=k_acq,
                             raw_init=raw)

    if acqf == "ucb":
        def _acq_step(params, state, k_acq, scalar, extra, raw):
            fn = lambda X: acq.q_upper_confidence_bound(model, params, state, X, scalar, k_acq, 128, cfg)
            return _opt(fn, k_acq, raw)
    elif acqf == "ei":
        def _acq_step(params, state, k_acq, scalar, extra, raw):
            fn = lambda X: acq.q_expected_improvement(model, params, state, X, scalar, k_acq, 128, cfg)
            return _opt(fn, k_acq, raw)
    elif acqf == "nei":
        def _acq_step(params, state, k_acq, scalar, extra, raw):
            fn = lambda X: acq.q_noisy_expected_improvement(model, params, state, X, extra, k_acq, 128, cfg)
            return _opt(fn, k_acq, raw)
    elif acqf == "kg":
        def _acq_step(params, state, k_acq, scalar, extra, raw):
            fn = lambda X: acq.q_knowledge_gradient(model, params, state, X, extra, scalar, k_acq, 8, cfg)
            return _opt(fn, k_acq, raw)
    elif acqf == "mves":
        def _acq_step(params, state, k_acq, scalar, extra, raw):
            fn = lambda X: acq.q_max_value_entropy(
                model, params, state, X, extra, k_acq, 16, cfg, noise_value=noise_std**2
            )
            return _opt(fn, k_acq, raw)
    else:
        raise ValueError(f"unknown acquisition {acqf!r} (ucb/ei/nei/kg/mves)")
    acq_step = jax.jit(_acq_step)
    cond_step = jax.jit(
        lambda state, xq, yq: wiski_condition(
            model, state, xq, yq, noise_value * jnp.ones_like(yq)
        )
    )
    _dummy_scalar = jnp.asarray(0.0, jnp.float32)
    _dummy_extra = jnp.zeros((1, dim), jnp.float32)

    records = []
    best_f = jnp.max(train_y)

    for step_i in range(num_steps):
        t0 = time.time()
        params, _, loss = fit(params, state, opt.init(params))
        t_fit = time.time() - t0

        key, k_acq, k_eval = jax.random.split(key, 3)
        raw = sobol_raw_init(batch_size, dim, acq_raw, seed * 100003 + step_i)

        scalar, extra = _dummy_scalar, _dummy_extra
        if acqf == "ucb":
            scalar = jnp.asarray(0.9**step_i, jnp.float32)
        elif acqf in ("ei", "kg"):
            scalar = best_f
        if acqf == "nei":
            # fixed-size recent-observation baseline (wrap-pad below 64
            # points so the jitted program's shapes never change)
            base = np.asarray(train_u)[-nei_baseline_size:]
            reps = -(-nei_baseline_size // len(base))
            extra = jnp.asarray(np.concatenate([base] * reps)[:nei_baseline_size])
        elif acqf == "kg":
            key, k_disc = jax.random.split(key)
            extra = jax.random.uniform(k_disc, (256, dim))
        elif acqf == "mves":
            key, k_disc = jax.random.split(key)
            extra = jax.random.uniform(k_disc, (512, dim))

        t0 = time.time()
        cand_u, acq_val = acq_step(params, state, k_acq, scalar, extra, raw)
        t_acq = time.time() - t0

        cand_x = _denormalize(cand_u, fn.bounds)
        y_new, latent_new = fn.noisy(cand_x, k_eval, noise_std)
        y_std_new = ((y_new - y_mean) / y_std)[:, None]

        t0 = time.time()
        state = cond_step(state, cand_u, y_std_new)
        jax.block_until_ready(state.roots.root)
        t_cond = time.time() - t0

        train_u = jnp.concatenate([train_u, cand_u])
        train_y = jnp.concatenate([train_y, y_std_new])
        best_f = jnp.max(train_y)
        latent = jnp.concatenate([latent, latent_new])
        best_per_step.append(float(jnp.max(latent)))
        rec = dict(step=step_i + 1, best_value=best_per_step[-1], acq_value=float(acq_val),
                   mll=-float(loss), fit_time=t_fit, acq_time=t_acq, cond_time=t_cond)
        records.append(rec)
        if logger is not None:
            logger.log(rec, step=step_i + 1, table_name="bayesopt_metrics")
        if verbose and (step_i % 5 == 4 or step_i == 0):
            print(f"step {step_i+1}: best {best_per_step[-1]:.4f} acq {float(acq_val):.4f} "
                  f"(fit {t_fit:.2f}s acq {t_acq:.2f}s cond {t_cond*1e3:.1f}ms)")

    if checkpoint_path is not None:
        from online_gp_tpu.utils.checkpoint import save_pytree

        save_pytree(checkpoint_path, dict(
            params=params, state=state, train_u=train_u, train_y=train_y,
            y_mean=y_mean, y_std=y_std, latent=latent,
            best_per_step=jnp.asarray(best_per_step),
            surrogate=surrogate,
        ))

    return dict(best_per_step=best_per_step, records=records, optimal=fn.optimal_value,
                checkpoint=checkpoint_path)


def main():
    import sys

    from online_gp_tpu.experiments.config import parse_cli_kwargs

    out = run_bayesopt(**parse_cli_kwargs(sys.argv[1:]))
    print("best value trajectory:", [round(v, 3) for v in out["best_per_step"]])


if __name__ == "__main__":
    main()
