"""Active learning with qNIPV on the malaria dataset (WISKI vs exact GP).

TPU re-build of ``experiments/active_learning/qnIPV_experiment.py``:
pool-based — fit a WISKI GP (30x30 grid, Matern-1/2 ARD, Gamma priors on
the hypers; reference lines 85-103) or an exact GP on a small seed set,
then per step: refit with decayed lr -> maximize qNIPV over the unit
square -> snap to the nearest un-queried pool point (kernel distance;
reference lines 202-209) -> condition -> log test RMSE + mean variance.
"""

from __future__ import annotations

import time
from typing import Dict

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
    wiski_predict,
)
from online_gp_tpu.models.exact_online import (
    ExactGPModel,
    exact_data_init,
    exact_data_append,
    exact_gp_mll,
    exact_gp_posterior,
)
from online_gp_tpu.data.malaria import malaria_dataset
from online_gp_tpu.bayesopt.acquisitions import q_negative_integrated_posterior_variance
from online_gp_tpu.bayesopt.optimize import optimize_acqf


def run_active_learning(
    model_type: str = "wiski",  # or "exact"
    num_steps: int = 25,
    num_init: int = 50,
    num_test: int = 500,
    grid_size: int = 30,
    mc_points: int = 256,
    fit_iters: int = 100,
    fit_lr: float = 0.1,
    lr_decay: float = 0.97,
    seed: int = 0,
    data_path=None,
    logger=None,
    verbose: bool = True,
    checkpoint_path=None,
) -> Dict:
    data = malaria_dataset(data_path, seed=seed)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data.x))
    test_idx, pool_idx = perm[:num_test], perm[num_test:]
    seed_idx, pool_idx = pool_idx[:num_init], pool_idx[num_init:]

    x_all = jnp.asarray(data.x)
    y_all = jnp.asarray(data.y)[:, None]
    nv_all = jnp.asarray(data.y_var)[:, None]
    test_x, test_y = x_all[test_idx], y_all[test_idx]
    cfg = SolverConfig()

    kernel = make_kernel("matern12")
    priors = (("raw_lengthscale", GammaPrior(3.0, 6.0)), ("raw_outputscale", GammaPrior(2.0, 0.15)))

    queried = list(seed_idx)
    train_x = x_all[jnp.asarray(seed_idx)]
    train_y = y_all[jnp.asarray(seed_idx)]
    train_nv = nv_all[jnp.asarray(seed_idx)]

    if model_type == "wiski":
        grid = Grid.create([(-0.05, 1.05)] * 2, grid_size)
        model = WiskiModel(kernel, grid, num_outputs=1, priors=priors)
        params = model.init_params(2)
        state = wiski_init(model, train_x, train_y, train_nv)

        def fit(params, state, lr):
            opt = optax.adam(lr)

            @jax.jit
            def run(p, s):
                def step(carry, _):
                    pp, os_ = carry
                    loss, g = jax.value_and_grad(lambda q: -jnp.sum(wiski_mll(model, q, s, cfg)))(pp)
                    up, os_ = opt.update(g, os_, pp)
                    return (optax.apply_updates(pp, up), os_), loss

                (pp, _), losses = jax.lax.scan(step, (p, opt.init(p)), None, length=fit_iters)
                return pp, losses[-1]

            return run(params, state)

        def posterior(params, state, xt):
            return wiski_predict(model, params, state, xt, cfg)

        def condition(state, xi, yi, ni):
            return wiski_condition(model, state, xi, yi, ni)

        def nipv(params, state, X):
            mc = x_all[jnp.asarray(rng.choice(test_idx, size=mc_points))]
            return lambda C: q_negative_integrated_posterior_variance(model, params, state, C, mc, cfg)

    elif model_type == "exact":
        # the reference's exact arm is botorch FixedNoiseGP with a RADIAL
        # ARD Matern-1/2 + the same Gamma priors
        # (``qnIPV_experiment.py:106-119``); the product matern12 above is
        # the grid-structured family only the SKI arm needs
        model = ExactGPModel(
            make_kernel("radial_matern12"), num_outputs=1, learn_noise=False,
            priors=priors,
        )
        params = model.init_params(2)
        state = exact_data_init(train_x, train_y, train_nv)

        def fit(params, state, lr):
            opt = optax.adam(lr)

            @jax.jit
            def run(p, s):
                def step(carry, _):
                    pp, os_ = carry
                    loss, g = jax.value_and_grad(lambda q: -jnp.sum(exact_gp_mll(model, q, s)))(pp)
                    up, os_ = opt.update(g, os_, pp)
                    return (optax.apply_updates(pp, up), os_), loss

                (pp, _), losses = jax.lax.scan(step, (p, opt.init(p)), None, length=fit_iters)
                return pp, losses[-1]

            return run(params, state)

        def posterior(params, state, xt):
            return exact_gp_posterior(model, params, state, xt)

        def condition(state, xi, yi, ni):
            return exact_data_append(state, xi, yi, ni)

        def nipv(params, state, X):
            mc = x_all[jnp.asarray(rng.choice(test_idx, size=mc_points))]

            def acqf(C):
                # exact-GP fantasy variance via masked-buffer append
                st = exact_data_append(state, C, jnp.zeros((C.shape[0], 1), C.dtype),
                                       jnp.full((C.shape[0], 1), 0.1, C.dtype))
                _, var = exact_gp_posterior(params=params, model=model, data=st, xt=mc)
                return -jnp.mean(var)

            return acqf
    else:
        raise ValueError(model_type)

    records = []
    lr = fit_lr
    for step_i in range(num_steps):
        t0 = time.time()
        params, loss = fit(params, state, lr)
        lr *= lr_decay
        t_fit = time.time() - t0

        acqf = nipv(params, state, None)
        bounds = jnp.asarray([[0.0, 1.0], [0.0, 1.0]], jnp.float32)
        t0 = time.time()
        cand, acq_val = optimize_acqf(acqf, bounds, q=1, num_restarts=6, raw_samples=24, maxiter=60)
        t_acq = time.time() - t0

        # snap to the nearest un-queried pool point (kernel distance)
        pool = x_all[jnp.asarray(pool_idx)]
        d2 = jnp.sum((pool - cand[0]) ** 2, axis=-1)
        j = int(jnp.argmin(d2))
        pick = pool_idx[j]
        pool_idx = np.delete(pool_idx, j)
        queried.append(pick)

        state = condition(state, x_all[pick][None], y_all[pick][None], nv_all[pick][None])

        mean, var = posterior(params, state, test_x)
        rmse = float(jnp.sqrt(jnp.mean((mean[0] - test_y[:, 0]) ** 2)))
        avg_var = float(jnp.mean(var))
        rec = dict(step=step_i + 1, test_rmse=rmse, avg_variance=avg_var,
                   mll=-float(loss), fit_time=t_fit, acq_time=t_acq)
        records.append(rec)
        if logger is not None:
            logger.log(rec, step=step_i + 1, table_name="active_learning_metrics")
        if verbose and (step_i % 5 == 4 or step_i == 0):
            print(f"step {step_i+1}: test RMSE {rmse:.4f}, avg var {avg_var:.4f}")

    if checkpoint_path is not None:
        # persist the final surrogate + query trace, matching the
        # reference's end-of-run ``torch.save(model.state_dict(), ...)``
        # (``qnIPV_experiment.py:233-238``)
        from online_gp_tpu.utils.checkpoint import save_pytree

        save_pytree(checkpoint_path, dict(
            params=params, state=state,
            queried=jnp.asarray(np.asarray(queried, dtype=np.int64)),
        ))

    return dict(records=records, num_queried=len(queried), synthetic_data=data.synthetic,
                checkpoint=checkpoint_path)


def main():
    import sys

    from online_gp_tpu.experiments.config import parse_cli_kwargs

    out = run_active_learning(**parse_cli_kwargs(sys.argv[1:]))
    print("final:", out["records"][-1])


if __name__ == "__main__":
    main()
