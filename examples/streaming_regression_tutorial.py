"""Tutorial: streaming GP regression with WISKI on TPU.

The script equivalent of the reference's streaming-regression notebook
(``notebooks/streaming_regression.ipynb``): batch-pretrain a WISKI GP on a
seed set, then stream observations one at a time with constant-time O(m^2)
updates, tracking prequential error — and show the two TPU-native extras:
exact rank-q micro-batched streaming and the pure functional core under
``lax.scan``.

Run:  python examples/streaming_regression_tutorial.py
"""

import time

import jax
import jax.numpy as jnp

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem
from online_gp_tpu.data import sin_cos_dataset

# ---------------------------------------------------------------- data
train_x, train_y, test_x, test_y = sin_cos_dataset(n=800, noise=0.05, seed=0)
n_init = 80

# ------------------------------------------------- wrapper API (level 5)
model = OnlineSKIRegression(
    IdentityStem(2), train_x[:n_init], train_y[:n_init],
    lr=0.05, grid_size=16, grid_bound=1.0,
)

print("== batch pretraining ==")
records = model.fit(train_x[:n_init], train_y[:n_init], num_epochs=40)
print(f"  final train loss {records[-1]['train_loss']:.3f}, "
      f"learned noise {records[-1]['noise']:.3f}")

print("== streaming one point at a time ==")
model.set_lr(0.01)
preq_sq_err = 0.0
t0 = time.time()
for t in range(n_init, 400):
    x_t, y_t = train_x[t : t + 1], train_y[t : t + 1]
    mean, var = model.predict(x_t)              # prequential: predict ...
    preq_sq_err += float(jnp.mean((mean - y_t) ** 2))
    model.update(x_t, y_t)                      # ... then absorb, O(m^2)
dt = time.time() - t0
rmse, nll = model.evaluate(test_x, test_y)
print(f"  {400 - n_init} updates in {dt:.1f}s; "
      f"prequential RMSE {jnp.sqrt(preq_sq_err / (400 - n_init)):.3f}; "
      f"test RMSE {rmse:.3f}, NLL {nll:.3f}")

# ------------------------------------- functional core (levels 1-4) under scan
print("== functional core: jitted scan over the rest of the stream ==")
from online_gp_tpu.models import wiski_condition, wiski_predict

wiski = model.model  # the static WiskiModel spec inside the wrapper

@jax.jit
def stream(state, xs, ys):
    def step(s, inp):
        x_i, y_i = inp
        return wiski_condition(wiski, s, x_i[None], y_i[None], jnp.ones_like(y_i[None])), 0.0

    s, _ = jax.lax.scan(step, state, (xs, ys))
    return s

xs, ys = jnp.asarray(train_x[400:]), jnp.asarray(train_y[400:])
state = stream(model.state, xs, ys)
jax.block_until_ready(state.roots.root)
t0 = time.time()
state = stream(model.state, xs, ys)
jax.block_until_ready(state.roots.root)
print(f"  {xs.shape[0]} scanned updates in {time.time() - t0:.3f}s "
      f"({xs.shape[0] / (time.time() - t0):,.0f}/s)")

model.state = state
rmse, nll = model.evaluate(test_x, test_y)
print(f"  after full stream: test RMSE {rmse:.3f}, NLL {nll:.3f}")
