"""Checkpoint/resume for model state pytrees.

The reference's checkpointing is vestigial (SURVEY.md §5): a configured
but unused ``checkpoint_dir``, state-dict deep-copies that are never
restored, and ad-hoc ``torch.save`` of final states. Here the WISKI cache
dict *is* the checkpoint object (reference constructor path
``batched_fixed_noise_online_gp.py:86-90,151-152`` rebuilds a model from
``kernel_cache`` + hypers), and every model family's state is already an
immutable pytree — so checkpointing is a structured array dump.

Format: ``.npz`` array payload plus a **self-describing structure JSON**
(dict/list/tuple/NamedTuple/None nodes encoded recursively, NamedTuple
classes by import path). Restore therefore needs no exemplar — a
checkpoint saved with optional components (e.g. SGPR ``moments``) loads
into a fresh wrapper whose attribute is still ``None`` — and when an
exemplar IS supplied its treedef is validated against the saved one, so a
structurally different exemplar fails loudly instead of silently
assigning arrays to the wrong fields.
"""

from __future__ import annotations

import importlib
import json
import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _npz_path(path: str) -> str:
    return path if path.endswith(".npz") else path + ".npz"


def _structure_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".structure.json"


# ---------------------------------------------------------------------------
# self-describing structure encoding
# ---------------------------------------------------------------------------


def _encode(node: Any, leaves: List[Any]) -> Dict:
    if node is None:
        return {"kind": "none"}
    if isinstance(node, dict):
        return {"kind": "dict", "items": {str(k): _encode(v, leaves) for k, v in node.items()}}
    if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
        return {
            "kind": "namedtuple",
            "cls": f"{type(node).__module__}:{type(node).__qualname__}",
            "fields": {f: _encode(getattr(node, f), leaves) for f in node._fields},
        }
    if isinstance(node, (list, tuple)):
        return {
            "kind": "list" if isinstance(node, list) else "tuple",
            "items": [_encode(v, leaves) for v in node],
        }
    leaves.append(node)
    return {"kind": "leaf", "index": len(leaves) - 1}


def _decode(spec: Dict, leaves: List[Any]) -> Any:
    kind = spec["kind"]
    if kind == "none":
        return None
    if kind == "dict":
        return {k: _decode(v, leaves) for k, v in spec["items"].items()}
    if kind == "namedtuple":
        mod, qual = spec["cls"].split(":")
        cls = importlib.import_module(mod)
        for part in qual.split("."):
            cls = getattr(cls, part)
        return cls(**{f: _decode(v, leaves) for f, v in spec["fields"].items()})
    if kind == "list":
        return [_decode(v, leaves) for v in spec["items"]]
    if kind == "tuple":
        return tuple(_decode(v, leaves) for v in spec["items"])
    if kind == "leaf":
        return leaves[spec["index"]]
    raise ValueError(f"unknown checkpoint node kind {kind!r}")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _orbax_dir(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return os.path.abspath(base + ".orbax")


def save_pytree(path: str, tree: Any, backend: str = "npz") -> None:
    """Save an arbitrary pytree of arrays/scalars to ``path``.

    backend="npz" (default): .npz array payload. backend="orbax": the
    leaf arrays go through orbax-checkpoint (tensorstore-backed, async/
    multi-host capable) instead. Both write the same self-describing
    structure JSON next to the payload, so either loads exemplar-free
    through :func:`load_pytree`.
    """
    leaves: List[Any] = []
    encoding = _encode(tree, leaves)
    treedef = jax.tree.flatten(tree)[1]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        target = _orbax_dir(path)
        if os.path.exists(target):
            shutil.rmtree(target)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, arrays)
        # drop a stale .npz payload from an earlier save at the same path,
        # so the structure JSON's backend record never disagrees with the
        # payload that would be found on disk
        if os.path.exists(_npz_path(path)):
            os.remove(_npz_path(path))
    elif backend == "npz":
        np.savez(_npz_path(path), **arrays)
        if os.path.isdir(_orbax_dir(path)):
            import shutil

            shutil.rmtree(_orbax_dir(path))
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r} (npz/orbax)")
    with open(_structure_path(path), "w") as f:
        json.dump(
            {
                "treedef": str(treedef),
                "num_leaves": len(leaves),
                "encoding": encoding,
                "backend": backend,
            },
            f,
        )


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Load a pytree saved by :func:`save_pytree`.

    Without ``like`` the saved structure JSON reconstructs the tree
    (including NamedTuple node types). With ``like`` the exemplar's
    treedef must match the saved one — a mismatch raises instead of
    silently assigning leaves by index to the wrong fields.
    """
    import jax.numpy as jnp

    structure = None
    if os.path.exists(_structure_path(path)):
        with open(_structure_path(path)) as f:
            structure = json.load(f)

    # dispatch on the backend RECORDED with the structure (older
    # checkpoints without the record fall back to payload sniffing) so a
    # stale payload from a different-backend save at the same path can
    # never shadow the one this structure JSON describes
    backend = (structure or {}).get("backend")
    if backend is None:
        backend = "orbax" if os.path.isdir(_orbax_dir(path)) else "npz"
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            arrays = ckptr.restore(_orbax_dir(path))
        leaves = [jnp.asarray(arrays[f"leaf_{i}"]) for i in range(len(arrays))]
    else:
        npz = np.load(_npz_path(path))

        def _leaf(arr):
            # string/metadata leaves (e.g. a surrogate tag) round-trip as
            # python values — jax arrays are numeric-only
            if arr.dtype.kind in ("U", "S"):
                return str(arr.item()) if arr.ndim == 0 else arr
            return jnp.asarray(arr)

        leaves = [_leaf(npz[f"leaf_{i}"]) for i in range(len(npz.files))]

    if like is not None:
        like_leaves, treedef = jax.tree.flatten(like)
        if structure is not None and structure.get("treedef") not in (None, str(treedef)):
            raise ValueError(
                "checkpoint structure mismatch:\n"
                f"  saved:    {structure['treedef']}\n"
                f"  exemplar: {treedef}"
            )
        if len(leaves) != len(like_leaves):
            raise ValueError(
                f"checkpoint has {len(leaves)} leaves but exemplar has {len(like_leaves)}"
            )
        return jax.tree.unflatten(treedef, leaves)

    if structure is None or "encoding" not in structure:
        raise ValueError(
            f"{path}: no self-describing structure JSON; pass an exemplar via like="
        )
    return _decode(structure["encoding"], leaves)


_WRAPPER_KEYS = ("params", "stem_params", "stem_state", "state", "moments", "old")


def save_wrapper(path: str, wrapper) -> None:
    """Checkpoint a task wrapper (params + state + stem params/state and
    any optional components the wrapper carries)."""
    blob = {}
    for key in _WRAPPER_KEYS:
        if hasattr(wrapper, key) and getattr(wrapper, key) is not None:
            blob[key] = getattr(wrapper, key)
    save_pytree(path, blob)


def load_wrapper(path: str, wrapper) -> None:
    """Restore a checkpoint saved by :func:`save_wrapper` in place.

    The component set comes from the SAVED structure, not the destination
    wrapper — a checkpoint saved with ``moments`` restores into a fresh
    wrapper whose ``moments`` is still ``None``.
    """
    restored = load_pytree(path)
    for key, value in restored.items():
        setattr(wrapper, key, value)