"""Multi-trial sweep runner.

The reference farms independent trials as separate processes
(``scripts/launch_jobs.sh``, Hydra submitit launchers — one GPU per
trial; SURVEY.md §2.14). TPU-native analog: either run trials
sequentially in one process (``--mode=seq``, the bash-loop equivalent) or
batch/shard them over the device mesh in ONE jitted program
(``--mode=mesh`` — see :mod:`online_gp_tpu.parallel`), which is the
replacement for a whole Slurm array.

Usage:
    python -m online_gp_tpu.experiments.sweep num_trials=4 mode=seq \
        model=wiski_gp_regression dataset=friedman stem=linear ...
"""

from __future__ import annotations

import sys
from typing import Dict, List

import numpy as np


def run_sweep(num_trials: int, mode: str, overrides: List[str]) -> List[Dict]:
    results = []
    if mode == "seq":
        from online_gp_tpu.experiments.config import parse_config
        from online_gp_tpu.experiments.regression import regression_trial
        from online_gp_tpu.experiments.classification import classification_trial

        for trial in range(num_trials):
            cfg = parse_config(overrides + [f"trial_id={trial}", f"seed={trial}"])
            np.random.seed(trial)
            if cfg["model"]["type"] == "classification":
                results.append(classification_trial(cfg))
            else:
                results.append(regression_trial(cfg))
        return results

    if mode == "mesh":
        # batched trials of the WISKI flagship sharded over the mesh:
        # one jitted program runs num_trials independent streams.
        import jax
        import jax.numpy as jnp
        import optax

        from online_gp_tpu.kernels import RBFKernel
        from online_gp_tpu.ops import Grid
        from online_gp_tpu.models.wiski import WiskiModel, wiski_init
        from online_gp_tpu.parallel import make_mesh, shard_leading, batched_trials_step
        from online_gp_tpu.data import streaming_friedman

        n_dev = len(jax.devices())
        mesh = make_mesh(min(n_dev, num_trials))
        grid = Grid.create([(-1.1, 1.1)] * 2, 16)
        model = WiskiModel(RBFKernel(), grid, num_outputs=1, learn_additional_noise=True)
        opt = optax.adam(1e-2)

        def init_trial(seed):
            tx, ty, ex, ey = streaming_friedman(n=1024, num_dims=2, seed=int(seed))
            params = model.init_params(2)
            state = wiski_init(model, jnp.asarray(tx[:256]), jnp.asarray(ty[:256]),
                               jnp.ones((256, 1), jnp.float32))
            return params, opt.init(params), state, jnp.asarray(tx[256:512]), jnp.asarray(ty[256:512])

        per_trial = [init_trial(s) for s in range(num_trials)]
        stack = lambda i: jax.tree.map(lambda *xs: jnp.stack(xs), *[t[i] for t in per_trial])
        params, opt_states, states = stack(0), stack(1), stack(2)
        xs, ys = stack(3), stack(4)
        params = shard_leading(params, mesh)
        opt_states = shard_leading(opt_states, mesh)
        states = shard_leading(states, mesh)

        step = jax.jit(batched_trials_step(model, opt))
        for chunk in range(0, xs.shape[1], 8):
            xb = xs[:, chunk : chunk + 8]
            yb = ys[:, chunk : chunk + 8]
            nb = jnp.ones_like(yb)
            params, opt_states, states, losses = step(params, opt_states, states, xb, yb, nb)
        jax.block_until_ready(losses)
        for t in range(num_trials):
            results.append(dict(trial=t, final_loss=float(losses[t]), num_data=int(states.num_data[t])))
        return results

    raise ValueError(f"unknown sweep mode {mode!r} (seq/mesh)")


def main():
    args = sys.argv[1:]
    num_trials, mode, overrides = 2, "seq", []
    for a in args:
        k, v = a.split("=", 1)
        if k == "num_trials":
            num_trials = int(v)
        elif k == "mode":
            mode = v
        else:
            overrides.append(a)
    results = run_sweep(num_trials, mode, overrides)
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
