"""Multi-chip scaling via jax.sharding meshes.

The reference has no distributed backend at all (SURVEY.md §2.14): its
only parallelism is farming independent Slurm processes per trial
(``config/hydra/launcher/submitit_slurm.yaml``, ``scripts/launch_jobs.sh``).
The TPU-native analog is much stronger: batch the independent work
(trials / outputs / fantasy branches) into a leading array dimension,
shard that dimension over an ICI mesh, and let XLA partition every batched
einsum with zero collectives. One jitted program replaces a Slurm sweep.

``batched_trials_step`` is the canonical pattern: T independent WISKI
streams (one per trial), each doing a full training step (Woodbury-MLL
Adam step + O(m^2) conditioning), vmapped then sharded over the ``dp``
mesh axis.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_condition,
    wiski_mll,
)


def make_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis_name,))


def shard_leading(tree: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Place every leaf with its leading dim sharded over the mesh axis."""

    def put(x):
        if getattr(x, "ndim", 0) >= 1:
            spec = P(axis_name, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def batched_trials_step(
    model: WiskiModel,
    optimizer: optax.GradientTransformation,
    cfg: SolverConfig = DEFAULT_CONFIG,
):
    """Build a jittable (params, opt_state, state, x, y, noise) -> ... step
    over a leading trials dim: hyper gradient step + conditioning per trial.

    All arguments carry a leading T dim (params/state/batches); shard T
    with :func:`shard_leading` and jit — XLA partitions the whole step
    along T with no cross-device communication (embarrassingly parallel,
    like the reference's process farming, minus the processes).
    """

    def one_trial(params, opt_state, state, x, y, noise):
        def loss(p):
            return -jnp.sum(wiski_mll(model, p, state, cfg))

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        state = wiski_condition(model, state, x, y, noise)
        return params, opt_state, state, l

    return jax.vmap(one_trial)
