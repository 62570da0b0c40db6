"""Tutorial: bulk absorption and O(m^2) prequential prediction.

Shows the two round-2 streaming additions on top of the basic tutorial
(``streaming_regression_tutorial.py``):

1. ``absorb`` — bulk conditioning through the blocked-product recursion
   (``wiski_stream``): one exact rank-1 update per point, restructured so
   the O(m^2) work runs as rank-128 MXU chunks (~744k updates/s at a
   30x30 grid on one chip — vs ~12.8 us/update for un-blocked rank-1).
2. Incremental predictive caches — after ``predict()`` builds the
   grid-space (mean, cov) caches once, conditioning-only ``update()``s
   refresh them with exact O(m^2) Gaussian conditioning instead of the
   O(m^3) rebuild the reference performs after every update, so a
   prequential evaluate->update loop with frozen hypers never pays a
   Cholesky.

Run:  python examples/bulk_streaming_tutorial.py
"""

import time

import jax
import jax.numpy as jnp

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem
from online_gp_tpu.data import sin_cos_dataset

train_x, train_y, test_x, test_y = sin_cos_dataset(n=4000, noise=0.05, seed=0)
n_init, n_bulk = 200, 2500

model = OnlineSKIRegression(
    IdentityStem(2), train_x[:n_init], train_y[:n_init],
    lr=0.05, grid_size=20, grid_bound=1.0, slim_state=True,
    refresh_roots_every=4096,
)
model.fit(train_x[:n_init], train_y[:n_init], num_epochs=40)
rmse0, _ = model.evaluate(test_x, test_y)
print(f"after pretrain            : test RMSE {rmse0:.4f}")

# ---- 1) bulk absorption (conditioning only; hypers frozen) ------------
t0 = time.perf_counter()
model.absorb(train_x[n_init : n_init + n_bulk], train_y[n_init : n_init + n_bulk])
jax.block_until_ready(model.state.roots.root)
dt = time.perf_counter() - t0
rmse1, _ = model.evaluate(test_x, test_y)
print(f"absorb {n_bulk} pts in {dt:.2f}s ({n_bulk/dt:,.0f}/s incl. compile): "
      f"test RMSE {rmse1:.4f}")

# ---- 2) prequential evaluate->update with live caches -----------------
# the first predict builds the grid-space caches; each conditioning-only
# update then refreshes them in O(m^2) — watch _pred_caches stay live
stream = train_x[n_init + n_bulk : n_init + n_bulk + 30]
stream_y = train_y[n_init + n_bulk : n_init + n_bulk + 30]
sq_err = 0.0
for i in range(stream.shape[0]):
    mean, var = model.predict(stream[i : i + 1])          # uses cached (mu, C)
    sq_err += float((mean[0, 0] - stream_y[i, 0]) ** 2)
    model.update(stream[i : i + 1], stream_y[i : i + 1],
                 update_stem=False, update_gp=False)       # O(m^2) cache refresh
    assert model._pred_caches is not None
print(f"prequential RMSE over {stream.shape[0]} pts: "
      f"{(sq_err / stream.shape[0]) ** 0.5:.4f}")

rmse2, nll2 = model.evaluate(test_x, test_y)
print(f"final                     : test RMSE {rmse2:.4f}  NLL {nll2:.3f}")
