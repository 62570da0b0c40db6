"""Tutorial: checkpoint/resume and the Bayesian-optimization loop.

Round-3 feature tour:

1. **Checkpoint/resume** — every task wrapper's learned state (hypers,
   WISKI caches, stem params) is an immutable pytree, so a checkpoint is
   a structured array dump (`utils/checkpoint.py`): ``save_wrapper`` at
   any point, ``load_wrapper`` into a FRESH wrapper later, and the
   stream continues exactly where it left off. The experiment drivers do
   this automatically (``final_state`` next to their CSVs); this shows
   the manual API.
2. **BayesOpt with the L-BFGS refit** — ``run_bayesopt`` refits the
   Woodbury MLL every step; ``fit_method="lbfgs"`` (optax L-BFGS + zoom
   linesearch, the reference's ``fit_gpytorch_model`` optimizer class)
   reaches a lower loss than Adam at the same step budget.
   ``checkpoint_path=`` persists the final surrogate + queried data.

Run:  python examples/checkpoint_bayesopt_tutorial.py
"""

import os
import tempfile

import jax
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem
from online_gp_tpu.data import sin_cos_dataset
from online_gp_tpu.utils.checkpoint import load_wrapper, save_wrapper

workdir = tempfile.mkdtemp(prefix="online_gp_tour_")

# ---------------------------------------------------------------------------
# 1. stream -> checkpoint -> restore into a fresh wrapper -> keep streaming
# ---------------------------------------------------------------------------
train_x, train_y, test_x, test_y = sin_cos_dataset(n=1200, noise=0.05, seed=0)
n_init = 200

model = OnlineSKIRegression(IdentityStem(2), train_x[:n_init], train_y[:n_init],
                            grid_size=16, lr=0.05)
model.fit(train_x[:n_init], train_y[:n_init], num_epochs=40)
for i in range(n_init, 600, 4):
    model.update(train_x[i : i + 4], train_y[i : i + 4], update_stem=False)
rmse_before, nll_before = model.evaluate(test_x, test_y)
print(f"[checkpoint] at 600 streamed points: RMSE {rmse_before:.4f}")

ckpt = os.path.join(workdir, "mid_stream")
save_wrapper(ckpt, model)

# ... process restarts; rebuild the wrapper shell and restore the state
fresh = OnlineSKIRegression(IdentityStem(2), train_x[:n_init], train_y[:n_init],
                            grid_size=16, lr=0.05)
load_wrapper(ckpt, fresh)
rmse_restored, _ = fresh.evaluate(test_x, test_y)
assert abs(rmse_restored - rmse_before) < 1e-6, "restore must be exact"
print(f"[restore]    fresh wrapper reproduces RMSE {rmse_restored:.4f}")

n_rest = (len(train_x) - 600) // 4 * 4
for i in range(600, 600 + n_rest, 4):
    fresh.update(train_x[i : i + 4], train_y[i : i + 4], update_stem=False)
rmse_after, _ = fresh.evaluate(test_x, test_y)
print(f"[resume]     after the remaining {n_rest} points: RMSE {rmse_after:.4f}")

# ---------------------------------------------------------------------------
# 2. BayesOpt: Adam vs L-BFGS refit on Ackley-2d, with a final checkpoint
# ---------------------------------------------------------------------------
from online_gp_tpu.bayesopt.loop import run_bayesopt

common = dict(function="Ackley", dim=2, acqf="ucb", num_steps=8, num_init=10,
              grid_size=10, fit_iters=25, seed=0, verbose=False)
out_adam = run_bayesopt(**common)
out_lbfgs = run_bayesopt(**common, fit_method="lbfgs",
                         checkpoint_path=os.path.join(workdir, "bo_final"))
print(f"[bayesopt]   best value  adam: {out_adam['best_per_step'][-1]:.4f}   "
      f"lbfgs: {out_lbfgs['best_per_step'][-1]:.4f}   (optimum 0.0)")

from online_gp_tpu.utils.checkpoint import load_pytree

blob = load_pytree(os.path.join(workdir, "bo_final"))
print(f"[bayesopt]   checkpoint holds {blob['train_u'].shape[0]} queried points "
      f"+ hypers + WISKI caches -> warm-start the next campaign from it")
