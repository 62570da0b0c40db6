"""Kernel functions as parameter pytrees + pure apply functions.

Design notes (TPU-first, not a gpytorch translation):

- Parameters are plain dicts of raw arrays; positivity is via a static
  reparametrization instead of gpytorch's constraint objects — ``exp``
  (unbounded, the default) or a sigmoid interval (``IntervalTransform``,
  the analog of gpytorch's ``Interval(lower, upper)`` used by the
  reference's BO/AL surrogates, ``experiments/bayesopt/bayesopt.py:66-75``).
  ``kernel.constrain(lengthscale_bounds=…, outputscale_bounds=…)`` swaps
  the reparam; everything downstream reads constrained values through
  ``kernel.lengthscale(params)`` / ``kernel.outputscale(params)``.
- Every kernel here is a *product* kernel across input dimensions
  multiplied by an output scale. That is exactly the family gpytorch's
  grid kernels exploit for Kronecker structure, and is what the reference
  effectively runs inside ``GridInterpolationKernel``
  (``batched_fixed_noise_online_gp.py:107-120``): RBF-ARD is natively a
  product; "Matern" on a grid is the per-dimension product Matern.
- Batched hyperparameters (one set per output/class, the reference's
  ``batch_shape``) are leading dims on the param arrays; all apply
  functions broadcast over them.

Parameters:
  ``raw_lengthscale``: (..., D) log lengthscales (ARD).
  ``raw_outputscale``: (...,) log output scale (ScaleKernel).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)


class ExpTransform(NamedTuple):
    """Unbounded positivity reparam: constrained = exp(raw) (the default)."""

    def forward(self, raw: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(raw)

    def inverse(self, value: float) -> float:
        return math.log(value)


class IntervalTransform(NamedTuple):
    """Bounded reparam: constrained = lower + (upper-lower)*sigmoid(raw).

    The sigmoid-interval transform of gpytorch's ``Interval`` constraint —
    the reference's BO/AL surrogates bound lengthscale/outputscale with
    ``Interval(1e-4, 12.0)`` (``experiments/bayesopt/bayesopt.py:66-75``).
    """

    lower: float
    upper: float

    def forward(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(raw)

    def inverse(self, value: float) -> float:
        u = (value - self.lower) / (self.upper - self.lower)
        if not 0.0 < u < 1.0:
            raise ValueError(
                f"init value {value} outside interval ({self.lower}, {self.upper})"
            )
        return math.log(u) - math.log1p(-u)


class Kernel:
    """Stationary product kernel: k(x, z) = s^2 * prod_d k_d(|x_d - z_d| / l_d)."""

    name = "base"

    def __init__(self):
        # raw-param name -> reparameterization; exp (unbounded) by default
        self.transforms = {
            "raw_lengthscale": ExpTransform(),
            "raw_outputscale": ExpTransform(),
        }

    def constrain(
        self,
        lengthscale_bounds: Optional[Tuple[float, float]] = None,
        outputscale_bounds: Optional[Tuple[float, float]] = None,
    ) -> "Kernel":
        """Bound hyperparameters to an interval (returns self for chaining)."""
        if lengthscale_bounds is not None:
            self.transforms["raw_lengthscale"] = IntervalTransform(*lengthscale_bounds)
        if outputscale_bounds is not None:
            self.transforms["raw_outputscale"] = IntervalTransform(*outputscale_bounds)
        return self

    def lengthscale(self, params: Params) -> jnp.ndarray:
        """Constrained lengthscales (..., D)."""
        return self.transforms["raw_lengthscale"].forward(params["raw_lengthscale"])

    def outputscale(self, params: Params) -> jnp.ndarray:
        """Constrained output scale (...,)."""
        return self.transforms["raw_outputscale"].forward(params["raw_outputscale"])

    def init_params(
        self,
        num_dims: int,
        batch_shape=(),
        lengthscale: float = 0.693,
        outputscale: float = 1.0,
        dtype=jnp.float32,
    ) -> Params:
        raw_ls = self.transforms["raw_lengthscale"].inverse(lengthscale)
        raw_os = self.transforms["raw_outputscale"].inverse(outputscale)
        return {
            "raw_lengthscale": jnp.full(tuple(batch_shape) + (num_dims,), raw_ls, dtype),
            "raw_outputscale": jnp.full(tuple(batch_shape), raw_os, dtype),
        }

    # -- per-dimension profile --------------------------------------------

    def profile(self, r: jnp.ndarray) -> jnp.ndarray:
        """k_d(r) for nonnegative scaled distance r (unit lengthscale)."""
        raise NotImplementedError

    # -- full matrices ----------------------------------------------------

    def matrix(self, params: Params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        """Dense kernel matrix.

        Args:
          params: possibly batch-leading params.
          x1: (n1, D); x2: (n2, D).
        Returns:
          (..., n1, n2) with ... the params' batch shape.
        """
        ls = self.lengthscale(params)  # (..., D)
        scale = self.outputscale(params)  # (...,)
        diff = x1[:, None, :] - x2[None, :, :]  # (n1, n2, D)
        r = jnp.abs(diff) / ls[..., None, None, :]  # (..., n1, n2, D)
        k = jnp.prod(self.profile(r), axis=-1)
        return scale[..., None, None] * k

    def factor_1d(self, params: Params, d: int, g: jnp.ndarray, include_scale: bool) -> jnp.ndarray:
        """Per-dimension grid factor T_d = k_d(g, g) — (..., m_d, m_d)."""
        ls = self.lengthscale(params)[..., d]  # (...,)
        r = jnp.abs(g[:, None] - g[None, :]) / ls[..., None, None]
        t = self.profile(r)
        if include_scale:
            t = self.outputscale(params)[..., None, None] * t
        return t

    def factor_col(self, params: Params, d: int, g: jnp.ndarray, include_scale: bool) -> jnp.ndarray:
        """First column of the (Toeplitz) grid factor — (..., m_d)."""
        ls = self.lengthscale(params)[..., d]
        r = jnp.abs(g - g[0]) / ls[..., None]
        c = self.profile(r)
        if include_scale:
            c = self.outputscale(params)[..., None] * c
        return c


class RBFKernel(Kernel):
    """Squared-exponential; ARD product form is exact."""

    name = "rbf"

    def profile(self, r: jnp.ndarray) -> jnp.ndarray:
        return jnp.exp(-0.5 * r * r)


class MaternKernel(Kernel):
    """Per-dimension product Matern (nu in {0.5, 1.5, 2.5}).

    Note: the product across dimensions (the grid-structured family) is
    what the reference runs inside SKI; the radial ARD Matern used by its
    *exact* baselines is available as ``RadialMaternKernel``.
    """

    name = "matern"

    def __init__(self, nu: float = 2.5):
        super().__init__()
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError(f"unsupported nu={nu}")
        self.nu = nu

    def profile(self, r: jnp.ndarray) -> jnp.ndarray:
        if self.nu == 0.5:
            return jnp.exp(-r)
        if self.nu == 1.5:
            s = _SQRT3 * r
            return (1.0 + s) * jnp.exp(-s)
        s = _SQRT5 * r
        return (1.0 + s + s * s / 3.0) * jnp.exp(-s)


class RadialMaternKernel(Kernel):
    """Isotropic/ARD Matern on the Euclidean radius (non-separable).

    Used by exact-GP baselines (reference: botorch ``SingleTaskGP`` default
    Matern-5/2 ARD) — has no Kronecker grid structure, so it is not valid
    inside the SKI/grid path.
    """

    name = "radial_matern"

    def __init__(self, nu: float = 2.5):
        super().__init__()
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError(f"unsupported nu={nu}")
        self.nu = nu

    def profile(self, r: jnp.ndarray) -> jnp.ndarray:  # pragma: no cover
        raise NotImplementedError("radial kernel has no per-dim profile")

    def matrix(self, params: Params, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        ls = self.lengthscale(params)
        scale = self.outputscale(params)
        diff = (x1[:, None, :] - x2[None, :, :]) / ls[..., None, None, :]
        r2 = jnp.sum(diff * diff, axis=-1)
        r = jnp.sqrt(jnp.maximum(r2, 1e-30))
        if self.nu == 0.5:
            k = jnp.exp(-r)
        elif self.nu == 1.5:
            s = _SQRT3 * r
            k = (1.0 + s) * jnp.exp(-s)
        else:
            s = _SQRT5 * r
            k = (1.0 + s + s * s / 3.0) * jnp.exp(-s)
        return scale[..., None, None] * k


def _make_sm(num_mixtures: int):
    from online_gp_tpu.kernels.spectral_mixture import SpectralMixtureKernel

    return SpectralMixtureKernel(num_mixtures)


_REGISTRY = {
    "rbf": lambda: RBFKernel(),
    "matern12": lambda: MaternKernel(0.5),
    "matern32": lambda: MaternKernel(1.5),
    "matern52": lambda: MaternKernel(2.5),
    "radial_matern12": lambda: RadialMaternKernel(0.5),
    "radial_matern32": lambda: RadialMaternKernel(1.5),
    "radial_matern52": lambda: RadialMaternKernel(2.5),
    # spectral mixture (reference notebook covar_module,
    # regression_viz_1D.ipynb: SpectralMixtureKernel(num_mixtures=3))
    "sm2": lambda: _make_sm(2),
    "sm3": lambda: _make_sm(3),
    "sm4": lambda: _make_sm(4),
    "spectral_mixture": lambda: _make_sm(3),
}


def make_kernel(name: str) -> Kernel:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"unknown kernel {name!r}; known: {sorted(_REGISTRY)}")
