"""Feature-extractor stems (Identity / Linear / MLP).

Capability match for the reference's ``online_gp/models/stems.py``: every
learned stem ends in an affine-free BatchNorm followed by ``tanh(x/2)``,
squashing features into the SKI grid bounds [-1, 1]. Functional design:
parameters and BatchNorm running statistics are explicit pytrees threaded
through ``apply`` (train mode returns updated stats), so stems compose
with jit/grad/vmap.

``utils/dkl.py``'s grid-bound-scaled ``FeatureExtractor`` is covered by
the ``output_scale`` knob on :class:`MLPStem`.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


class Stem:
    input_dim: int
    output_dim: int

    def init(self, key) -> Tuple[Params, Params]:
        """Returns (params, bn_state)."""
        raise NotImplementedError

    def apply(self, params: Params, bn_state: Params, x: jnp.ndarray, train: bool):
        """Returns (features, new_bn_state)."""
        raise NotImplementedError

    @property
    def has_params(self) -> bool:
        return True


class IdentityStem(Stem):
    def __init__(self, input_dim: int):
        self.input_dim = input_dim
        self.output_dim = input_dim

    def init(self, key):
        return {}, {}

    def apply(self, params, bn_state, x, train: bool):
        return x, bn_state

    @property
    def has_params(self) -> bool:
        return False


def _bn_init(dim: int, dtype=jnp.float32) -> Params:
    return {
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
        "momentum": jnp.asarray(0.1, dtype),
    }


def _bn_apply(state: Params, h: jnp.ndarray, train: bool, eps: float = 1e-5):
    """Affine-free BatchNorm1d with running statistics."""
    if train:
        mu = jnp.mean(h, axis=0)
        # torch tracks the unbiased variance in running stats but
        # normalizes with the biased one
        var = jnp.var(h, axis=0)
        n = h.shape[0]
        unbiased = var * n / max(n - 1, 1)
        mom = state["momentum"]
        new_state = {
            "mean": (1 - mom) * state["mean"] + mom * mu,
            "var": (1 - mom) * state["var"] + mom * unbiased,
            "momentum": mom,
        }
        out = (h - mu) / jnp.sqrt(var + eps)
        return out, new_state
    out = (h - state["mean"]) / jnp.sqrt(state["var"] + eps)
    return out, state


def _linear_init(key, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    return {
        "w": jax.random.uniform(kw, (d_in, d_out), minval=-bound, maxval=bound, dtype=dtype),
        "b": jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound, dtype=dtype),
    }


class LinearStem(Stem):
    """Linear -> BatchNorm(affine=False) -> tanh(x/2)."""

    def __init__(self, input_dim: int, feature_dim: int):
        self.input_dim = input_dim
        self.output_dim = feature_dim

    def init(self, key):
        return {"lin": _linear_init(key, self.input_dim, self.output_dim)}, {"bn": _bn_init(self.output_dim)}

    def apply(self, params, bn_state, x, train: bool):
        h = x @ params["lin"]["w"] + params["lin"]["b"]
        h, bn = _bn_apply(bn_state["bn"], h, train)
        return jnp.tanh(h / 2.0), {"bn": bn}


class MLPStem(Stem):
    """depth x (Linear, ReLU) -> Linear -> BatchNorm -> tanh(x/2)."""

    def __init__(
        self,
        input_dim: int,
        feature_dim: int,
        depth: int = 2,
        hidden_dims: Sequence[int] | str = (64, 64),
        output_scale: float = 1.0,
    ):
        if isinstance(hidden_dims, str):
            hidden_dims = [int(d) for d in hidden_dims.split(",")]
        hidden_dims = list(hidden_dims)
        if len(hidden_dims) < depth:
            hidden_dims = hidden_dims + [hidden_dims[-1]] * (depth - len(hidden_dims))
        self.input_dim = input_dim
        self.output_dim = feature_dim
        self.depth = depth
        self.hidden_dims = hidden_dims
        self.output_scale = output_scale

    def init(self, key):
        dims = [self.input_dim] + self.hidden_dims[: self.depth] + [self.output_dim]
        keys = jax.random.split(key, len(dims) - 1)
        params = {f"lin{i}": _linear_init(k, dims[i], dims[i + 1]) for i, k in enumerate(keys)}
        return params, {"bn": _bn_init(self.output_dim)}

    def apply(self, params, bn_state, x, train: bool):
        h = x
        n_layers = self.depth + 1
        for i in range(n_layers):
            h = h @ params[f"lin{i}"]["w"] + params[f"lin{i}"]["b"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        h, bn = _bn_apply(bn_state["bn"], h, train)
        return self.output_scale * jnp.tanh(h / 2.0), {"bn": bn}


def make_stem(name: str, input_dim: int, feature_dim: Optional[int] = None, **kw) -> Stem:
    feature_dim = feature_dim or input_dim
    if name in ("eye", "identity"):
        return IdentityStem(input_dim)
    if name == "linear":
        return LinearStem(input_dim, feature_dim)
    if name == "mlp":
        return MLPStem(input_dim, feature_dim, **kw)
    raise ValueError(f"unknown stem {name!r}")
