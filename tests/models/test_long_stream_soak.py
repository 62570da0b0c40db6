"""Long-stream f32 drift soak (VERDICT r3 item 8).

The production drift policy — f32 rank-1 root updates with periodic
``wiski_refresh_roots`` re-anchoring (``refresh_roots_every``, DESIGN.md
§6) — exists precisely for streams of 1e5+ points, but until this test
nothing exercised that regime. Streams >= 1e5 single-point updates in
float32, refreshing at a production cadence, and asserts:

1. ``wiski_check_decomposition`` errors stay bounded end-to-end;
2. posterior predictions from the f32 streamed state track a float64
   oracle built exactly (one f64 ``wiski_init`` over the full stream).

Grid 20^2 (m=400) keeps the CPU-CI runtime under the 120 s budget while
staying in the same blocked-recursion regime as the m=900 flagship.
"""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels.base import RBFKernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_check_decomposition,
    wiski_init,
    wiski_predict,
    wiski_refresh_roots,
    wiski_stream,
)

N_STREAM = 100_352  # >= 1e5, whole 4096-blocks
REFRESH_EVERY = 4096  # production cadence: re-anchor roots every 4k points


@pytest.mark.slow
def test_long_stream_f32_drift_bounded_and_tracks_f64_oracle():
    d = 2
    grid = Grid.create([(-1.1, 1.1)] * d, 20)  # m = 400
    model = WiskiModel(RBFKernel(), grid, num_outputs=1)
    params = model.init_params(d, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    kx, ky, kt = jax.random.split(key, 3)
    x_all = jax.random.uniform(
        kx, (N_STREAM + 256, d), minval=-1, maxval=1, dtype=jnp.float32
    )
    y_all = (
        jnp.sin(3 * x_all[:, :1]) * jnp.cos(2 * x_all[:, 1:])
        + 0.05 * jax.random.normal(ky, (N_STREAM + 256, 1), jnp.float32)
    ).astype(jnp.float32)
    nz_all = jnp.ones_like(y_all)

    # f32 streamed state: init on 256 seed points, then one exact rank-1
    # update per point through the blocked recursion, re-anchoring the
    # roots every REFRESH_EVERY points like the wrapper's
    # refresh_roots_every policy (api/regression.py:372-376).
    state = wiski_init(model, x_all[:256], y_all[:256], nz_all[:256])
    stream = jax.jit(
        lambda s, xs, ys, ns: wiski_stream(model, s, xs, ys, ns)
    )
    refresh = jax.jit(wiski_refresh_roots)
    for start in range(256, N_STREAM + 256, REFRESH_EVERY):
        stop = min(start + REFRESH_EVERY, N_STREAM + 256)
        state = stream(
            state, x_all[start:stop], y_all[start:stop], nz_all[start:stop]
        )
        state = refresh(state)
    assert int(state.num_data) == N_STREAM + 256  # 256 seed + full stream

    # decomposition health after >= 1e5 f32 rank-1 updates + refreshes
    health = wiski_check_decomposition(state)
    inv_err = float(health["inverse_root_err"][0])
    recon_err = float(health["root_recon_rel_err"][0])
    assert np.isfinite(inv_err) and inv_err < 5e-3, f"B'L-I drift {inv_err}"
    assert np.isfinite(recon_err) and recon_err < 5e-3, f"LL'-A drift {recon_err}"

    # f64 oracle: the same posterior built exactly in one double-precision
    # init over the whole stream
    model64 = WiskiModel(RBFKernel(), grid, num_outputs=1)
    params64 = model64.init_params(d, dtype=jnp.float64)
    state64 = wiski_init(
        model64,
        x_all.astype(jnp.float64),
        y_all.astype(jnp.float64),
        nz_all.astype(jnp.float64),
    )

    xt = jax.random.uniform(kt, (512, d), minval=-1, maxval=1, dtype=jnp.float32)
    m32, v32 = wiski_predict(model, params, state, xt)
    m64, v64 = wiski_predict(
        model64, params64, state64, xt.astype(jnp.float64)
    )
    m64 = np.asarray(m64, np.float64)
    v64 = np.asarray(v64, np.float64)
    mean_err = np.max(np.abs(np.asarray(m32, np.float64) - m64))
    mean_scale = max(np.max(np.abs(m64)), 1e-3)
    var_rel = np.max(
        np.abs(np.asarray(v32, np.float64) - v64) / np.maximum(v64, 1e-8)
    )
    assert mean_err / mean_scale < 2e-2, f"posterior-mean drift {mean_err / mean_scale}"
    assert var_rel < 5e-2, f"posterior-variance drift {var_rel}"
