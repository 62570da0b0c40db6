"""Tutorial: 1-D WISKI posterior visualization with a Spectral Mixture kernel.

Script equivalent of the reference's ``notebooks/regression_viz_1D.ipynb``,
which runs ``FixedNoiseOnlineSKIGP`` with
``gpytorch.kernels.SpectralMixtureKernel(num_mixtures=3)``: batch-fit on a
seed set, stream the remaining points through constant-time conditioning,
and dump the posterior mean / 95% band along a dense 1-D test line to CSV
(plot with any tool; this image is headless).

Run:  python examples/regression_viz_1d.py
"""

import csv
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.api import OnlineSKIRegression, IdentityStem

# ---------------------------------------------------------------- data
rng = np.random.RandomState(0)
n = 320
x = np.sort(rng.uniform(-1, 1, (n, 1)), axis=0).astype(np.float32)
f = lambda t: np.sin(2 * math.pi * 2.0 * t) + 0.5 * np.sin(2 * math.pi * 5.0 * t)
y = (f(x) + 0.05 * rng.randn(n, 1)).astype(np.float32)
n_init, n_batch = 64, 224

# --------------------------------------------- SM-kernel WISKI (level 5)
# kernel="sm3" = SpectralMixtureKernel(num_mixtures=3); the wrapper
# initializes the mixture from the empirical spectrum of the init data.
model = OnlineSKIRegression(
    IdentityStem(1), x[:n_init], y[:n_init], lr=0.03, grid_size=64, kernel="sm3"
)
model.fit(x[:n_batch], y[:n_batch], num_epochs=120)
print(f"batch fit done; learned noise {float(model.noise.mean()):.4f}")

# ------------------------------------------------------- stream the rest
for i in range(n_batch, n):
    model.update(x[i : i + 1], y[i : i + 1])
print(f"streamed {n - n_batch} points (O(m^2) conditioning each)")

# ------------------------------------------------ posterior band to CSV
line = np.linspace(-1, 1, 400, dtype=np.float32)[:, None]
mean, var = model.predict(line)
mean, sd = np.asarray(mean)[:, 0], np.sqrt(np.asarray(var))[:, 0]
rmse = float(np.sqrt(np.mean((mean - f(line)[:, 0]) ** 2)))
print(f"dense-line RMSE vs truth: {rmse:.4f}")

out = os.path.join(os.path.dirname(__file__), "regression_viz_1d.csv")
with open(out, "w", newline="") as fh:
    w = csv.writer(fh)
    w.writerow(["x", "mean", "lo95", "hi95", "truth"])
    for i in range(line.shape[0]):
        w.writerow([float(line[i, 0]), mean[i], mean[i] - 1.96 * sd[i],
                    mean[i] + 1.96 * sd[i], float(f(line[i : i + 1])[0, 0])])
print(f"posterior band written to {out}")
