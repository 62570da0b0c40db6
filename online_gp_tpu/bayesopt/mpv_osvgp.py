"""Max-posterior-variance active learning with an online SVGP.

TPU re-build of ``experiments/active_learning/mpv_osvgp.py``: fit an SVGP
on seed data, then per step — generate a candidate maximizing the
*posterior variance* with the reference's own Adam-on-logit-candidates
pattern (``generate_candidates``, lines 68-95), snap to the nearest
un-queried pool point, absorb it with the Bui closed-form variational
update (``update_variational_parameters``), and periodically re-fit
hypers on the streaming ELBO.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.kernels.base import make_kernel
from online_gp_tpu.models.svgp import (
    SVGPModel,
    svgp_predict,
    svgp_elbo,
    svgp_snapshot,
    svgp_streaming_correction,
    svgp_closed_form_update,
    svgp_init_variational_to_prior,
)
from online_gp_tpu.data.malaria import malaria_dataset
from online_gp_tpu.bayesopt.optimize import optimize_acqf


def run_mpv_osvgp(
    num_steps: int = 25,
    num_init: int = 50,
    num_test: int = 500,
    num_inducing: int = 64,
    fit_iters: int = 200,
    refit_iters: int = 20,
    fit_lr: float = 0.05,
    seed: int = 0,
    data_path=None,
    logger=None,
    verbose: bool = True,
) -> Dict:
    data = malaria_dataset(data_path, seed=seed)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data.x))
    test_idx, pool_idx = perm[:num_test], perm[num_test:]
    seed_idx, pool_idx = pool_idx[:num_init], pool_idx[num_init:]

    x_all = jnp.asarray(data.x)
    y_all = jnp.asarray(data.y)
    test_x, test_y = x_all[jnp.asarray(test_idx)], y_all[jnp.asarray(test_idx)]

    model = SVGPModel(make_kernel("rbf"))
    key = jax.random.PRNGKey(seed)
    z = jax.random.uniform(key, (num_inducing, 2), minval=0.0, maxval=1.0)
    params = svgp_init_variational_to_prior(model, model.init_params(z, 2, lengthscale=0.3))

    train_x = x_all[jnp.asarray(seed_idx)]
    train_y = y_all[jnp.asarray(seed_idx)]

    opt = optax.adam(fit_lr)

    def fit(params, x, y, iters, old=None):
        os_ = opt.init(params)

        @jax.jit
        def run(p, os_):
            def step(carry, _):
                pp, s = carry

                def loss(q):
                    l = -svgp_elbo(model, q, x, y, x.shape[0], 1.0)
                    if old is not None:
                        l = l + svgp_streaming_correction(model, q, old, x.shape[0], 1e-3)
                    return l

                lval, g = jax.value_and_grad(loss)(pp)
                up, s = opt.update(g, s, pp)
                return (optax.apply_updates(pp, up), s), lval

            (p, _), losses = jax.lax.scan(step, (p, os_), None, length=iters)
            return p, losses[-1]

        return run(params, os_)

    params, loss = fit(params, train_x, train_y, fit_iters)

    records = []
    queried = list(seed_idx)
    for step_i in range(num_steps):
        # candidate = argmax posterior variance (reference generate_candidates)
        def mpv_acqf(C):
            _, var = svgp_predict(model, params, C)
            return jnp.sum(var)

        bounds = jnp.asarray([[0.0, 1.0], [0.0, 1.0]], jnp.float32)
        t0 = time.time()
        cand, acq_val = optimize_acqf(mpv_acqf, bounds, q=1, num_restarts=6,
                                      raw_samples=24, maxiter=100, key=jax.random.PRNGKey(step_i))
        t_acq = time.time() - t0

        pool = x_all[jnp.asarray(pool_idx)]
        j = int(jnp.argmin(jnp.sum((pool - cand[0]) ** 2, axis=-1)))
        pick = pool_idx[j]
        pool_idx = np.delete(pool_idx, j)
        queried.append(pick)
        train_x = jnp.concatenate([train_x, x_all[pick][None]])
        train_y = jnp.concatenate([train_y, y_all[pick][None]])

        # closed-form O-SVGP absorb + short streaming re-fit
        old = svgp_snapshot(model, params)
        params = svgp_closed_form_update(model, params, x_all[pick][None], y_all[pick][None])
        if refit_iters:
            params, loss = fit(params, train_x[-256:], train_y[-256:], refit_iters, old)

        mean, var = svgp_predict(model, params, test_x)
        rmse = float(jnp.sqrt(jnp.mean((mean - test_y) ** 2)))
        rec = dict(step=step_i + 1, test_rmse=rmse, avg_variance=float(var.mean()),
                   acq_value=float(acq_val), acq_time=t_acq)
        records.append(rec)
        if logger is not None:
            logger.log(rec, step=step_i + 1, table_name="mpv_metrics")
        if verbose and (step_i % 5 == 4 or step_i == 0):
            print(f"step {step_i+1}: test RMSE {rmse:.4f}, avg var {rec['avg_variance']:.4f}")

    return dict(records=records, num_queried=len(queried), synthetic_data=data.synthetic)


def main():
    import sys

    kwargs = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        kwargs[k] = v
    out = run_mpv_osvgp(**kwargs)
    print("final:", out["records"][-1])


if __name__ == "__main__":
    main()
