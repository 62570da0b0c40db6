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


def sharded_stream_blocked(
    L: jnp.ndarray,
    B: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "tp",
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel blocked streaming root updates: the (m, m) root and
    inverse root are ROW-sharded over ``axis_name`` and updated in place by
    the same blocked-product recursion as
    :func:`online_gp_tpu.ops.root_update.roots_stream_blocked`.

    Communication per rank-k chunk is ONE psum of the (k, m) p0 block
    (each device contributes S[:, local_rows] @ B[local_rows, :]); the
    factor recursion is replicated (O(k^2 m), tiny), and both rank-k
    applications contract over the FULL column axis, which every row
    shard holds — so they are entirely local. This scales WISKI's dense
    O(m^2) streaming regime past one chip's HBM/VMEM: per-device state is
    2 m^2/d floats and per-update traffic ~5 m^2/(k d).

    The reference has no distributed path at all (SURVEY.md §2.14); this
    is the TPU-native extension for grids beyond single-chip capacity.

    Args:
      L, B: (m, m) arrays (may be given replicated or sharded; they are
        re-placed row-sharded). m must divide evenly by the mesh axis size.
      idx, wv: (n, P) stencil indices / noise-scaled weights.
      mesh: mesh containing ``axis_name``.

    Returns (L', B') row-sharded over ``axis_name``.
    """
    from online_gp_tpu.ops.root_update import (
        blocked_factors_xla,
        pad_and_chunk_stream,
        stencil_rows,
    )

    m = L.shape[-1]
    d = mesh.shape[axis_name]
    if m % d != 0:
        raise ValueError(f"grid size m={m} must divide by mesh axis size {d}")
    rows_per = m // d
    idx_c, wv_c, k = pad_and_chunk_stream(idx, wv, block)

    row_sharded = NamedSharding(mesh, P_spec := P(axis_name, None))
    L = jax.device_put(L, row_sharded)
    B = jax.device_put(B, row_sharded)

    def local_stream(Ll, Bl, idx_c, wv_c):
        did = jax.lax.axis_index(axis_name)

        def chunk_step(carry, inp):
            Lc, Bc = carry
            ic, wc = inp
            # densify only this device's column slice: indices shifted
            # into [0, rows_per) match; out-of-shard stencil points fall
            # outside and produce zero rows, so the slice is exact at
            # O(k P m / d) per device.
            S_loc = stencil_rows(ic - did * rows_per, wc, rows_per)  # (k, m/d)
            p0 = jax.lax.psum(S_loc @ Bc, axis_name)  # (k, m)
            U, Pm, R = blocked_factors_xla(p0)
            Lc = Lc + (Lc @ R.T) @ U
            Bc = Bc + (Bc @ Pm.T) @ U
            return (Lc, Bc), 0.0

        with jax.default_matmul_precision("float32"):
            (Ll, Bl), _ = jax.lax.scan(chunk_step, (Ll, Bl), (idx_c, wv_c))
        return Ll, Bl

    fn = jax.shard_map(
        local_stream,
        mesh=mesh,
        in_specs=(P_spec, P_spec, P(), P()),
        out_specs=(P_spec, P_spec),
    )
    return fn(L, B, idx_c, wv_c)


def sharded_pred_stream_blocked(
    C: jnp.ndarray,
    mu: jnp.ndarray,
    idx: jnp.ndarray,
    wv: jnp.ndarray,
    y: jnp.ndarray,
    nz: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "tp",
    block: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tensor-parallel blocked prequential streaming (VERDICT r3 item 9).

    The (m, m) predictive covariance cache — the next single-chip memory
    wall after the roots — is ROW-sharded over ``axis_name`` and streamed
    through the same predict-then-condition recursion as
    :func:`online_gp_tpu.ops.pred_stream.pred_stream_blocked`.

    Per rank-k chunk the only communication is ONE psum of the (k, m)
    chunk-start projection block plus the (k,) mean projection (each
    device contributes S[:, local_rows] @ C[local_rows, :]); the O(k^2 m)
    factor recursion is replicated, and the boundary updates
    C -= Z^T Z / mu += Z^T r touch only local rows. Per-device state is
    m^2/d floats; per-point traffic ~2 k m / (k d) = 2 m / d.

    Args:
      C: (m, m) covariance cache; mu: (m,) mean cache (placed row-sharded
        here; m must divide by the mesh axis size).
      idx, wv: (n, P) stencil indices / weights (NOT noise-scaled).
      y, nz: (n,) targets / clamped noise.

    Returns (C' row-sharded, mu' sharded, pred_mean (n,), pred_var (n,))
    — the prequential moments, identical to the single-device recursion
    up to f32 reduction order.
    """
    from online_gp_tpu.ops.pred_stream import _pad_chunk_aux, pred_chunk_factors
    from online_gp_tpu.ops.root_update import pad_and_chunk_stream, stencil_rows

    m = C.shape[-1]
    d = mesh.shape[axis_name]
    if m % d != 0:
        raise ValueError(f"grid size m={m} must divide by mesh axis size {d}")
    rows_per = m // d
    n = idx.shape[0]
    idx_c, wv_c, k = pad_and_chunk_stream(idx, wv, block)
    y_c = _pad_chunk_aux(y, k, 0.0)
    nz_c = _pad_chunk_aux(nz, k, 1.0)

    row_sharded = NamedSharding(mesh, P_rows := P(axis_name, None))
    C = jax.device_put(C, row_sharded)
    mu = jax.device_put(mu.reshape(m, 1), row_sharded)

    def local_stream(Cl, mul, idx_c, wv_c, y_c, nz_c):
        did = jax.lax.axis_index(axis_name)

        def chunk_step(carry, inp):
            Cc, muc = carry  # (m/d, m), (m/d, 1)
            ic, wc, yc, nzc = inp
            # densify this device's column slice (out-of-shard stencil
            # points fall outside [0, rows_per) and produce zero rows)
            S_loc = stencil_rows(ic - did * rows_per, wc, rows_per)  # (k, m/d)
            with jax.default_matmul_precision("float32"):
                c0w = jax.lax.psum(S_loc @ Cc, axis_name)  # (k, m)
                mu0w = jax.lax.psum(S_loc @ muc, axis_name)[:, 0]  # (k,)
            S_full = stencil_rows(ic, wc, m)  # (k, m) replicated
            Z, r, pm, pv = pred_chunk_factors(S_full, c0w, mu0w, yc, nzc)
            Z_loc = jax.lax.dynamic_slice_in_dim(Z, did * rows_per, rows_per, 1)
            with jax.default_matmul_precision("float32"):
                Cc = Cc - Z_loc.T @ Z
                muc = muc + Z_loc.T @ r[:, None]
            return (Cc, muc), (pm, pv)

        (Cl, mul), (pms, pvs) = jax.lax.scan(
            chunk_step, (Cl, mul), (idx_c, wv_c, y_c, nz_c)
        )
        return Cl, mul, pms.reshape(-1), pvs.reshape(-1)

    fn = jax.shard_map(
        local_stream,
        mesh=mesh,
        in_specs=(P_rows, P_rows, P(), P(), P(), P()),
        out_specs=(P_rows, P_rows, P(), P()),
    )
    C, mu, pms, pvs = fn(C, mu, idx_c, wv_c, y_c, nz_c)
    return C, mu[:, 0], pms[:n], pvs[:n]


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


def localgp_experts_step(model, optimizer, lr_unused=None):
    """Expert-parallel LocalGP step: joint-MLL hyper gradient + mixture
    prediction with the EXPERT dimension sharded over the mesh.

    The LocalGP state is (E, ...)-leading throughout
    (``models/localgp.py::LocalGPState``), and every per-expert compute
    (masked Cholesky, solves, cross-covariances) is already vmapped over
    E — so sharding E with :func:`shard_leading` partitions the expert
    fleet across chips. The only cross-expert communication is the
    mixture reduction in ``localgp_predict`` (weight normalization + the
    weighted moment sums over E) and the scalar loss sum — XLA lowers
    both to one psum over the mesh axis. The reference's LocalGP
    (``online_gp/models/online_localgp_regression.py``) runs experts as
    a Python list on one device; this scales the expert count with the
    mesh.

    Returns ``step(params, opt_state, state, xt) -> (params, opt_state,
    loss, mean, var)`` — jit it with a sharded ``state`` (params/xt
    replicated).
    """
    from online_gp_tpu.models.localgp import localgp_joint_mll, localgp_predict

    def step(params, opt_state, state, xt):
        def loss_fn(p):
            return -localgp_joint_mll(model, p, state)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        mean, var, _ = localgp_predict(model, params, state, xt)
        return params, opt_state, loss, mean, var

    return step
