"""Regular inducing grids for SKI.

The reference gets its grid from gpytorch's ``GridInterpolationKernel`` /
``create_grid`` (consumed at reference
``online_gp/models/batched_fixed_noise_online_gp.py:114-120`` and
``experiments/bayesopt/bayesopt.py:141``). Semantics rebuilt here:

- a Cartesian product of per-dimension uniform 1-D grids,
- each 1-D grid is padded by two spacings beyond the user bounds so every
  query inside the bounds has a full 4-point cubic stencil,
- row-major flattening (dimension 0 slowest) — the same ordering used by
  the Kronecker-factored grid kernel in :mod:`online_gp_tpu.kernels`.

``Grid`` is a pytree whose sizes are static aux data, so it can be closed
over or passed through ``jit`` without retracing on value changes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Grid:
    """A static Cartesian inducing grid.

    Attributes:
      sizes: per-dimension grid sizes (static python ints).
      mins: (D,) first grid point per dimension.
      spacings: (D,) grid spacing per dimension.
    """

    def __init__(self, sizes: Tuple[int, ...], mins: jnp.ndarray, spacings: jnp.ndarray):
        self.sizes = tuple(int(s) for s in sizes)
        self.mins = mins
        self.spacings = spacings

    # -- construction ------------------------------------------------------

    @staticmethod
    def create(grid_bounds, grid_size, pad: int = 2, dtype=jnp.float32) -> "Grid":
        """Build a grid covering ``grid_bounds`` with a stencil-safe margin.

        Args:
          grid_bounds: sequence of (lo, hi) pairs, one per input dimension
            (matches the reference's ``grid_bounds`` tensor of shape (D, 2)).
          grid_size: int or sequence of ints — number of grid points per dim
            (reference default 30; ``batched_fixed_noise_online_gp.py:117``).
          pad: extra grid points beyond each bound (2 ⇒ cubic stencil fits
            for any query inside the bounds).
        """
        bounds = [(float(lo), float(hi)) for lo, hi in grid_bounds]
        ndim = len(bounds)
        if isinstance(grid_size, int):
            sizes = (grid_size,) * ndim
        else:
            sizes = tuple(int(g) for g in grid_size)
        if len(sizes) != ndim:
            raise ValueError(f"grid_size {sizes} does not match {ndim} dims")
        mins, spacings = [], []
        for (lo, hi), m in zip(bounds, sizes):
            if m < 2 * pad + 2:
                raise ValueError(f"grid size {m} too small for pad {pad}")
            h = (hi - lo) / (m - 1 - 2 * pad)
            mins.append(lo - pad * h)
            spacings.append(h)
        return Grid(sizes, jnp.asarray(mins, dtype), jnp.asarray(spacings, dtype))

    @staticmethod
    def from_data(x, grid_size, margin: float = 0.1, dtype=jnp.float32) -> "Grid":
        """Infer bounds from data ±margin, like the reference constructor
        (``batched_fixed_noise_online_gp.py:99-105``)."""
        lo = jnp.min(x, axis=0) - margin
        hi = jnp.max(x, axis=0) + margin
        bounds = [(float(a), float(b)) for a, b in zip(lo, hi)]
        return Grid.create(bounds, grid_size, dtype=dtype)

    # -- properties --------------------------------------------------------

    @property
    def ndim(self) -> int:
        return len(self.sizes)

    @property
    def num_points(self) -> int:
        return math.prod(self.sizes)

    @property
    def strides(self) -> Tuple[int, ...]:
        """Row-major strides: dimension 0 slowest."""
        strides = []
        acc = 1
        for s in reversed(self.sizes):
            strides.append(acc)
            acc *= s
        return tuple(reversed(strides))

    def points_1d(self, d: int) -> jnp.ndarray:
        """(sizes[d],) grid points along dimension d."""
        return self.mins[d] + self.spacings[d] * jnp.arange(self.sizes[d], dtype=self.mins.dtype)

    def full_points(self) -> jnp.ndarray:
        """(num_points, D) all grid points, row-major order."""
        axes = [self.points_1d(d) for d in range(self.ndim)]
        mesh = jnp.meshgrid(*axes, indexing="ij")
        return jnp.stack([m.reshape(-1) for m in mesh], axis=-1)

    # -- pytree ------------------------------------------------------------

    def tree_flatten(self):
        return (self.mins, self.spacings), self.sizes

    @classmethod
    def tree_unflatten(cls, aux, children):
        mins, spacings = children
        return cls(aux, mins, spacings)

    def __repr__(self):
        return f"Grid(sizes={self.sizes})"
