"""Randomness helpers (reference ``online_gp/utils/random.py``)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def shuffle_tensors(*arrays, key=None, seed: int = 0):
    """Shuffle arrays along their first dimension with a shared permutation
    (reference ``shuffle_tensors``, utils/random.py:4-8)."""
    key = jax.random.PRNGKey(seed) if key is None else key
    n = arrays[0].shape[0]
    perm = jax.random.permutation(key, n)
    out = tuple(jnp.asarray(a)[perm] for a in arrays)
    return out[0] if len(out) == 1 else out
