"""Synthetic optimization test functions.

The reference imports these from botorch (``experiments/bayesopt/utils.py``
enables Ackley, DixonPrice, Griewank, Levy, Michalewicz, Rastrigin,
Rosenbrock, StyblinskiTang). Each is implemented here directly; all are
*negated* (maximization convention, like the reference's ``negate=True``)
and expose per-function default bounds.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class TestFunction(NamedTuple):
    name: str
    dim: int
    bounds: jnp.ndarray  # (d, 2)
    optimal_value: float  # of the negated (maximized) function

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _EVALS[self.name](x)

    def noisy(self, x: jnp.ndarray, key, noise_std: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
        latent = self(x)
        return latent + noise_std * jax.random.normal(key, latent.shape, latent.dtype), latent


def _ackley(x):
    d = x.shape[-1]
    a, b, c = 20.0, 0.2, 2 * math.pi
    s1 = jnp.sqrt(jnp.mean(x**2, axis=-1))
    s2 = jnp.mean(jnp.cos(c * x), axis=-1)
    return -(-a * jnp.exp(-b * s1) - jnp.exp(s2) + a + math.e)


def _dixon_price(x):
    d = x.shape[-1]
    i = jnp.arange(2, d + 1)
    term = i * (2 * x[..., 1:] ** 2 - x[..., :-1]) ** 2
    return -((x[..., 0] - 1) ** 2 + jnp.sum(term, axis=-1))


def _griewank(x):
    i = jnp.sqrt(jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype))
    return -(jnp.sum(x**2, axis=-1) / 4000.0 - jnp.prod(jnp.cos(x / i), axis=-1) + 1.0)


def _levy(x):
    w = 1.0 + (x - 1.0) / 4.0
    t1 = jnp.sin(math.pi * w[..., 0]) ** 2
    t2 = jnp.sum((w[..., :-1] - 1) ** 2 * (1 + 10 * jnp.sin(math.pi * w[..., :-1] + 1) ** 2), axis=-1)
    t3 = (w[..., -1] - 1) ** 2 * (1 + jnp.sin(2 * math.pi * w[..., -1]) ** 2)
    return -(t1 + t2 + t3)


def _michalewicz(x):
    m = 10.0
    i = jnp.arange(1, x.shape[-1] + 1, dtype=x.dtype)
    return jnp.sum(jnp.sin(x) * jnp.sin(i * x**2 / math.pi) ** (2 * m), axis=-1)


def _rastrigin(x):
    d = x.shape[-1]
    return -(10.0 * d + jnp.sum(x**2 - 10.0 * jnp.cos(2 * math.pi * x), axis=-1))


def _rosenbrock(x):
    return -jnp.sum(100.0 * (x[..., 1:] - x[..., :-1] ** 2) ** 2 + (x[..., :-1] - 1) ** 2, axis=-1)


def _styblinski_tang(x):
    return -0.5 * jnp.sum(x**4 - 16 * x**2 + 5 * x, axis=-1)


_EVALS = {
    "Ackley": _ackley,
    "DixonPrice": _dixon_price,
    "Griewank": _griewank,
    "Levy": _levy,
    "Michalewicz": _michalewicz,
    "Rastrigin": _rastrigin,
    "Rosenbrock": _rosenbrock,
    "StyblinskiTang": _styblinski_tang,
}

_BOUNDS = {
    "Ackley": (-32.768, 32.768),
    "DixonPrice": (-10.0, 10.0),
    "Griewank": (-600.0, 600.0),
    "Levy": (-10.0, 10.0),
    "Michalewicz": (0.0, math.pi),
    "Rastrigin": (-5.12, 5.12),
    "Rosenbrock": (-5.0, 10.0),
    "StyblinskiTang": (-5.0, 5.0),
}

_OPTIMA = {
    "Ackley": 0.0,
    "DixonPrice": 0.0,
    "Griewank": 0.0,
    "Levy": 0.0,
    "Michalewicz": None,
    "Rastrigin": 0.0,
    "Rosenbrock": 0.0,
    "StyblinskiTang": None,  # 39.166 * d
}

TEST_FUNCTIONS = sorted(_EVALS)


def make_test_function(name: str, dim: int) -> TestFunction:
    if name not in _EVALS:
        raise ValueError(f"unknown test function {name!r}; known: {TEST_FUNCTIONS}")
    lo, hi = _BOUNDS[name]
    bounds = jnp.asarray([[lo, hi]] * dim, jnp.float32)
    opt = _OPTIMA[name]
    if name == "StyblinskiTang":
        opt = 39.16599 * dim
    return TestFunction(name, dim, bounds, opt if opt is not None else float("nan"))
