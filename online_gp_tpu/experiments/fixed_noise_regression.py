"""Fixed-noise streaming-regression timing benchmark (malaria).

TPU re-build of ``experiments/fixed_noise_regression/wiski_regression.py``
(lines 120-178): stream the malaria spatial data point-by-point into a
fixed-noise WISKI GP, doing a per-step Woodbury-MLL hyper fit +
conditioning, timing both phases, and logging test RMSE every
``eval_every`` steps — the reference's per-step timing benchmark, plus a
TPU-native chunked mode (``chunk_size > 1`` scans the conditioning, which
is where the hardware actually pays off).

Usage: python -m online_gp_tpu.experiments.fixed_noise_regression \
           num_steps=500 chunk_size=8
"""

from __future__ import annotations

import sys
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.kernels.base import make_kernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_mll,
    wiski_predict,
)
from online_gp_tpu.data.malaria import malaria_dataset
from online_gp_tpu.logging import CSVLogger


def run(
    num_steps: int = 500,
    num_init: int = 100,
    num_test: int = 500,
    grid_size: int = 30,
    chunk_size: int = 1,
    mll_iters_per_step: int = 1,
    lr: float = 0.01,
    eval_every: int = 25,
    seed: int = 0,
    data_path=None,
    log_dir: str = "logs",
    verbose: bool = True,
) -> Dict:
    data = malaria_dataset(data_path, seed=seed)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(data.x))
    x_all = jnp.asarray(data.x)[perm]
    y_all = jnp.asarray(data.y)[perm][:, None]
    nv_all = jnp.asarray(data.y_var)[perm][:, None]
    test_x, test_y = x_all[:num_test], y_all[:num_test]
    pool = slice(num_test, None)
    x_pool, y_pool, nv_pool = x_all[pool], y_all[pool], nv_all[pool]

    cfg = SolverConfig()
    grid = Grid.create([(-0.05, 1.05)] * 2, grid_size)
    model = WiskiModel(make_kernel("matern12"), grid, num_outputs=1)
    params = model.init_params(2)
    state = wiski_init(model, x_pool[:num_init], y_pool[:num_init], nv_pool[:num_init])

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def mll_step(params, opt_state, state):
        def step(carry, _):
            p, os_ = carry
            loss, g = jax.value_and_grad(lambda q: -jnp.sum(wiski_mll(model, q, state, cfg)))(p)
            up, os_ = opt.update(g, os_, p)
            return (optax.apply_updates(p, up), os_), loss

        (p, os_), losses = jax.lax.scan(step, (params, opt_state), None, length=mll_iters_per_step)
        return p, os_, losses[-1]

    @jax.jit
    def condition_chunk(state, xs, ys, ns):
        return wiski_condition(model, state, xs, ys, ns)

    logger = CSVLogger(log_dir, f"wiski_fixed_noise_chunk{chunk_size}")
    logger.add_table("timing_metrics")
    mll_times, cond_times = [], []
    t_start = time.time()
    pos = num_init
    steps_done = 0
    while steps_done < num_steps and pos + chunk_size <= x_pool.shape[0]:
        t0 = time.perf_counter()
        params, opt_state, loss = mll_step(params, opt_state, state)
        jax.block_until_ready(loss)
        mll_times.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        state = condition_chunk(
            state, x_pool[pos : pos + chunk_size], y_pool[pos : pos + chunk_size],
            nv_pool[pos : pos + chunk_size],
        )
        jax.block_until_ready(state.roots.root)
        cond_times.append(time.perf_counter() - t0)
        pos += chunk_size
        steps_done += 1

        if steps_done % eval_every == 0:
            mean, var = wiski_predict(model, params, state, test_x, cfg)
            rmse = float(jnp.sqrt(jnp.mean((mean[0] - test_y[:, 0]) ** 2)))
            rec = dict(
                num_data=int(state.num_data),
                test_rmse=rmse,
                mll_time_ms=1e3 * float(np.median(mll_times[-eval_every:])),
                cond_time_ms=1e3 * float(np.median(cond_times[-eval_every:])),
                mll=-float(loss),
            )
            logger.log(rec, step=steps_done, table_name="timing_metrics")
            if verbose:
                print(f"step {steps_done}: rmse {rmse:.4f} "
                      f"mll {rec['mll_time_ms']:.2f}ms cond {rec['cond_time_ms']:.2f}ms")

    logger.write_csv()
    total = time.time() - t_start
    return dict(
        steps=steps_done,
        points_absorbed=steps_done * chunk_size,
        total_time=total,
        median_mll_ms=1e3 * float(np.median(mll_times)),
        median_cond_ms=1e3 * float(np.median(cond_times)),
        points_per_sec=steps_done * chunk_size / max(sum(cond_times), 1e-9),
        log_dir=logger.log_dir,
    )


def main():
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
    out = run(**kwargs)
    print({k: (round(v, 3) if isinstance(v, float) else v) for k, v in out.items()})


if __name__ == "__main__":
    main()
