"""Spectral Mixture kernel (Wilson & Adams 2013).

The reference's 1-D regression notebook runs WISKI with gpytorch's
``SpectralMixtureKernel(num_mixtures=3)`` as the SKI base kernel
(``/root/reference/notebooks/regression_viz_1D.ipynb``, covar_module
cells). TPU-native build:

    k(tau) = sum_q  w_q  prod_d  exp(-2 pi^2 tau_d^2 s_qd^2) cos(2 pi tau_d mu_qd)

Each mixture component is separable across input dimensions, so on an
inducing grid K_uu is a SUM of Q Kronecker-of-Toeplitz matrices — the
grid assembly (:mod:`online_gp_tpu.kernels.grid_kernel`) sums the per-
component Kronecker chains (dense) or Toeplitz-FFT MVM passes
(``use_toeplitz``). Everything else (SKI interpolation, WISKI caches,
MLL) is kernel-agnostic and unchanged.

Parameters (raw = log space, batch-leading like the other kernels):
  ``raw_sm_weights``: (..., Q)      log mixture weights
  ``raw_sm_means``:   (..., Q, D)   log spectral means (frequencies)
  ``raw_sm_scales``:  (..., Q, D)   log spectral std deviations
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from online_gp_tpu.kernels.base import Kernel, Params

_TWO_PI = 2.0 * math.pi


class SpectralMixtureKernel(Kernel):
    name = "spectral_mixture"

    def __init__(self, num_mixtures: int = 3):
        super().__init__()
        if num_mixtures < 1:
            raise ValueError("num_mixtures must be >= 1")
        self.num_mixtures = num_mixtures

    # a mixture kernel: grid assembly sums over components
    @property
    def num_components(self) -> int:
        return self.num_mixtures

    def init_params(
        self,
        num_dims: int,
        batch_shape=(),
        lengthscale: float = 0.693,  # kept for signature parity; sets the freq band
        outputscale: float = 1.0,
        dtype=jnp.float32,
    ) -> Params:
        """Deterministic spread init: component means evenly spaced over a
        band of frequencies up to ~1/(2*lengthscale), scales at a tenth of
        the band, equal weights summing to ``outputscale`` (the gpytorch
        default random init has the same magnitudes; use
        :func:`sm_init_from_data` for its data-driven variant)."""
        Q, D = self.num_mixtures, num_dims
        bshape = tuple(batch_shape)
        band = 0.5 / max(lengthscale, 1e-3)
        means = jnp.linspace(band / (Q + 1), band * Q / (Q + 1), Q, dtype=dtype)
        means = jnp.broadcast_to(means[:, None], (Q, D))
        return {
            "raw_sm_weights": jnp.full(bshape + (Q,), math.log(outputscale / Q), dtype),
            "raw_sm_means": jnp.broadcast_to(
                jnp.log(means), bshape + (Q, D)
            ).astype(dtype),
            "raw_sm_scales": jnp.full(bshape + (Q, D), math.log(band / 10.0), dtype),
        }

    # -- component factors (consumed by kernels/grid_kernel.py) ------------

    def component_factor_1d(
        self, params: Params, q: int, d: int, g: jnp.ndarray, include_weight: bool
    ) -> jnp.ndarray:
        """Per-component per-dimension grid factor — (..., m_d, m_d)."""
        tau = g[:, None] - g[None, :]
        return self._component_profile(params, q, d, tau, include_weight)

    def component_factor_col(
        self, params: Params, q: int, d: int, g: jnp.ndarray, include_weight: bool
    ) -> jnp.ndarray:
        """First column of the (Toeplitz) component factor — (..., m_d)."""
        tau = g - g[0]
        return self._component_profile(params, q, d, tau, include_weight)

    def _component_profile(self, params, q, d, tau, include_weight):
        mu = jnp.exp(params["raw_sm_means"][..., q, d])  # (...,)
        sc = jnp.exp(params["raw_sm_scales"][..., q, d])
        t = tau  # (m, m) or (m,)
        shape_pad = (None,) * t.ndim
        mu_b = mu[(..., *shape_pad)]
        sc_b = sc[(..., *shape_pad)]
        k = jnp.exp(-2.0 * math.pi**2 * (t * sc_b) ** 2) * jnp.cos(_TWO_PI * t * mu_b)
        if include_weight:
            w = jnp.exp(params["raw_sm_weights"][..., q])
            k = w[(..., *shape_pad)] * k
        return k

    # -- dense matrix (exact baselines / tests) -----------------------------

    def matrix(self, params: Params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        w = jnp.exp(params["raw_sm_weights"])  # (..., Q)
        mu = jnp.exp(params["raw_sm_means"])  # (..., Q, D)
        sc = jnp.exp(params["raw_sm_scales"])  # (..., Q, D)
        tau = x1[:, None, :] - x2[None, :, :]  # (n1, n2, D)
        # broadcast: (..., Q, n1, n2, D)
        t = tau[None, ...]
        mu_b = mu[..., :, None, None, :]
        sc_b = sc[..., :, None, None, :]
        comp = jnp.exp(-2.0 * math.pi**2 * (t * sc_b) ** 2) * jnp.cos(_TWO_PI * t * mu_b)
        comp = jnp.prod(comp, axis=-1)  # (..., Q, n1, n2)
        return jnp.sum(w[..., :, None, None] * comp, axis=-3)

    def data_init_params(self, x, y, key, batch_shape=()) -> Params:
        """Data-driven init hook (task wrappers prefer this when present —
        SM is init-sensitive and the gpytorch workflow always calls
        ``initialize_from_data``)."""
        return sm_init_from_data(self, x, y, key, batch_shape)

    def profile(self, r):  # pragma: no cover
        raise NotImplementedError("mixture kernel has no single per-dim profile")

    def factor_1d(self, params, d, g, include_scale):  # pragma: no cover
        raise NotImplementedError("use component_factor_1d (num_components > 1)")

    def factor_col(self, params, d, g, include_scale):  # pragma: no cover
        raise NotImplementedError("use component_factor_col (num_components > 1)")


def sm_init_from_data(
    kernel: SpectralMixtureKernel,
    x: jnp.ndarray,
    y: jnp.ndarray,
    key,
    batch_shape=(),
) -> Dict:
    """Empirical-spectrum init (gpytorch's ``initialize_from_data_empspect``
    analog): per input dimension, resample y onto a regular grid over that
    dimension, FFT, and put the component means on the Q strongest spectral
    peaks; scales at a tenth of the frequency resolution band, weights from
    the peak powers normalized to var(y). Deterministic given the data
    (``key`` kept for signature stability; unused). SM fits live or die on
    this init — random-band starts routinely miss the signal frequencies."""
    import numpy as np

    del key  # deterministic init
    Q, D = kernel.num_mixtures, x.shape[-1]
    bshape = tuple(batch_shape)
    x_np = np.asarray(x, np.float64)
    y_np = np.asarray(y, np.float64).reshape(x_np.shape[0], -1).mean(axis=-1)
    y_np = y_np - y_np.mean()
    n_grid = int(min(2048, 4 * x_np.shape[0]))

    means = np.empty((Q, D))
    weights_acc = np.zeros((Q,))
    for d in range(D):
        order = np.argsort(x_np[:, d])
        xd, yd = x_np[order, d], y_np[order]
        lo, hi = float(xd[0]), float(xd[-1])
        span = max(hi - lo, 1e-6)
        grid_t = np.linspace(lo, hi, n_grid)
        yg = np.interp(grid_t, xd, yd)
        spec = np.abs(np.fft.rfft(yg)) ** 2
        freqs = np.fft.rfftfreq(n_grid, d=span / (n_grid - 1))
        spec[0] = 0.0  # drop DC
        top = np.argsort(spec)[::-1][:Q]
        # strongest peak first; pad with harmonically spaced fallbacks
        for qi in range(Q):
            if qi < len(top) and spec[top[qi]] > 0:
                means[qi, d] = max(freqs[top[qi]], 0.25 / span)
                weights_acc[qi] += spec[top[qi]]
            else:
                means[qi, d] = (qi + 1) * 0.5 / span
    scales = np.maximum(means / 10.0, 1e-3)
    var_y = max(float(np.var(y_np)), 1e-6)
    w = weights_acc / max(weights_acc.sum(), 1e-12) * var_y
    w = np.maximum(w, 1e-4 * var_y)

    def bc(a, shape):
        return jnp.broadcast_to(jnp.asarray(a), bshape + shape)

    return {
        "raw_sm_weights": jnp.log(bc(w, (Q,))),
        "raw_sm_means": jnp.log(bc(means, (Q, D))),
        "raw_sm_scales": jnp.log(bc(scales, (Q, D))),
    }
