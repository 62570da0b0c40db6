"""Local GP experts — kernel-routed mixture of exact GPs.

Capability match for the reference's ``LocalGPModel``
(``online_gp/models/online_localgp_regression.py``): a pool of exact GP
experts sharing one covariance module; each streamed point is routed to
the highest-kernel-weight expert with spare capacity (searching the top
half of the ranking), a fresh expert is spawned when all candidates are
full; prediction is a kernel-weighted mixture (weights clamped at 1e-4)
of the experts' Gaussian posteriors.

TPU design: experts live in ONE batched masked buffer (E, cap, ...) so
per-expert exact posteriors are a single batched Cholesky; routing (tiny,
data-dependent) runs host-side between jitted calls. ``max_experts`` is a
static bound (the jit-shape analog of the reference's unbounded
ModuleList).
"""

from __future__ import annotations

import math
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, tri_solve, chol_logdet
from online_gp_tpu.ops.precision import f32_matmuls

LOG_2PI = 1.8378770664093453


class LocalGPModel(NamedTuple):
    kernel: Kernel
    max_data_per_model: int = 256
    max_experts: int = 32
    jitter: float = 1e-6

    def init_params(self, num_dims: int, dtype=jnp.float32, **kw) -> Dict:
        return {
            "kernel": self.kernel.init_params(num_dims, (), dtype=dtype, **kw),
            "raw_noise": jnp.asarray(math.log(0.5), dtype),
        }


class LocalGPState(NamedTuple):
    x: jnp.ndarray  # (E, cap, d)
    y: jnp.ndarray  # (E, cap)
    mask: jnp.ndarray  # (E, cap)
    counts: jnp.ndarray  # (E,) int32
    active: jnp.ndarray  # (E,) 1.0 for live experts
    centers: jnp.ndarray  # (E, d) mean of each expert's inputs


def localgp_init(model: LocalGPModel, x, y, seed: int = 0) -> LocalGPState:
    """Split initial data over ceil(n/cap) experts (random assignment when
    it doesn't fit one expert — reference lines 29-38)."""
    x = np.asarray(x)
    y = np.asarray(y).reshape(-1)
    n, d = x.shape
    cap, E = model.max_data_per_model, model.max_experts
    rng = np.random.default_rng(seed)
    num_models = max(1, math.ceil(n / cap))
    if num_models > E:
        raise ValueError(f"init data needs {num_models} experts > max_experts={E}")
    assign = rng.integers(0, num_models, size=n) if num_models > 1 else np.zeros(n, np.int64)
    # rebalance random-assignment overflow so no point is dropped
    for e in range(num_models):
        idx = np.flatnonzero(assign == e)
        if len(idx) > cap:
            spill = idx[cap:]
            room = [m for m in range(num_models) if np.sum(assign == m) < cap]
            for p in spill:
                room = [m for m in room if np.sum(assign == m) < cap]
                if not room:
                    break
                assign[p] = room[0]

    xb = np.zeros((E, cap, d), np.float32)
    yb = np.zeros((E, cap), np.float32)
    mask = np.zeros((E, cap), np.float32)
    counts = np.zeros((E,), np.int32)
    centers = np.zeros((E, d), np.float32)
    active = np.zeros((E,), np.float32)
    for e in range(num_models):
        idx = np.flatnonzero(assign == e)[:cap]
        k = len(idx)
        xb[e, :k] = x[idx]
        yb[e, :k] = y[idx]
        mask[e, :k] = 1.0
        counts[e] = k
        centers[e] = x[idx].mean(axis=0) if k else 0.0
        active[e] = 1.0
    return LocalGPState(*map(jnp.asarray, (xb, yb, mask, counts, active, centers)))


@f32_matmuls
def localgp_weights(model: LocalGPModel, params: Dict, state: LocalGPState, x: jnp.ndarray) -> jnp.ndarray:
    """(n, E) kernel weights to expert centers (clamped, inactive zeroed)."""
    w = model.kernel.matrix(params["kernel"], x, state.centers)  # (n, E)
    w = jnp.clip(w, 1e-4, None) * state.active[None, :]
    return w


def localgp_route(model: LocalGPModel, params: Dict, state: LocalGPState, x_np: np.ndarray) -> int:
    """Host-side routing for ONE point (reference update lines 92-122):
    rank active experts by weight, take the best non-full among the top
    ceil(E_active/2); return -1 to request a new expert."""
    w = np.asarray(localgp_weights(model, params, state, jnp.asarray(x_np[None])))[0]
    counts = np.asarray(state.counts)
    active = np.asarray(state.active)
    n_active = int(active.sum())
    order = np.argsort(-w)
    candidates = [e for e in order if active[e] > 0][: math.ceil(n_active / 2)]
    for e in candidates:
        if counts[e] < model.max_data_per_model:
            return int(e)
    return -1


def localgp_add_point(state: LocalGPState, expert: int, x, y) -> LocalGPState:
    """Append one point to an expert (spawning it if inactive)."""
    e, c = expert, state.counts[expert]
    new_count = c + 1
    xe = state.x.at[e, c].set(x)
    new_center = jnp.sum(xe[e] * state.mask.at[e, c].set(1.0)[e][:, None], axis=0) / new_count
    return LocalGPState(
        x=xe,
        y=state.y.at[e, c].set(y),
        mask=state.mask.at[e, c].set(1.0),
        counts=state.counts.at[e].set(new_count),
        active=state.active.at[e].set(1.0),
        centers=state.centers.at[e].set(new_center),
    )


def _expert_chol(model: LocalGPModel, params: Dict, state: LocalGPState):
    K = jax.vmap(lambda xe: model.kernel.matrix(params["kernel"], xe, xe))(state.x)  # (E, cap, cap)
    mm = state.mask[:, :, None] * state.mask[:, None, :]
    noise = jnp.exp(params["raw_noise"])
    cap = state.x.shape[1]
    eye = jnp.eye(cap, dtype=K.dtype)
    diag = noise * state.mask + (1.0 - state.mask)
    Khat = K * mm + diag[:, :, None] * eye
    return psd_safe_cholesky(Khat, jitter=model.jitter)


@f32_matmuls
def localgp_joint_mll(model: LocalGPModel, params: Dict, state: LocalGPState) -> jnp.ndarray:
    """Sum of per-expert exact MLLs (the reference's
    ``SumMarginalLogLikelihood`` training objective), active experts only."""
    L = _expert_chol(model, params, state)
    ym = (state.y * state.mask)[:, :, None]
    alpha = tri_solve(L, ym)
    quad = jnp.sum(alpha * alpha, axis=(-2, -1))
    logdet = chol_logdet(L)
    n_e = jnp.maximum(state.counts.astype(quad.dtype), 1.0)
    per_expert = -0.5 * (quad + logdet + state.counts.astype(quad.dtype) * LOG_2PI) / n_e
    return jnp.sum(per_expert * state.active)


@f32_matmuls
def localgp_predict(
    model: LocalGPModel, params: Dict, state: LocalGPState, xt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mixture posterior: returns (mixture mean (n,), mixture var (n,),
    log-prob-ready per-expert stats). Mixture weights are normalized
    kernel weights (reference ``__call__`` eval branch, lines 62-72)."""
    L = _expert_chol(model, params, state)
    ym = (state.y * state.mask)[:, :, None]
    alpha = cho_solve(L, ym)  # (E, cap, 1)
    Kxt = jax.vmap(lambda xe: model.kernel.matrix(params["kernel"], xt, xe))(state.x)
    Kxt = Kxt * state.mask[:, None, :]  # (E, n, cap)
    means = (Kxt @ alpha)[..., 0]  # (E, n)
    v = tri_solve(L, Kxt.swapaxes(-1, -2))  # (E, cap, n)
    kdiag = model.kernel.outputscale(params["kernel"]) * jnp.ones((1, xt.shape[0]), xt.dtype)
    fvar = jnp.maximum(kdiag - jnp.sum(v * v, axis=-2), 1e-12)
    yvar = fvar + jnp.exp(params["raw_noise"])  # likelihood-added variance

    w = localgp_weights(model, params, state, xt)  # (n, E)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    mix_mean = jnp.sum(w * means.T, axis=-1)
    mix_var = jnp.sum(w * (yvar.T + means.T**2), axis=-1) - mix_mean**2
    return mix_mean, jnp.maximum(mix_var, 1e-12), (w, means.T, yvar.T)


def localgp_log_prob(stats, y: jnp.ndarray) -> jnp.ndarray:
    """Exact mixture log-density (for NLL metrics)."""
    w, means, variances = stats
    logp = -0.5 * (LOG_2PI + jnp.log(variances) + (y[:, None] - means) ** 2 / variances)
    return jax.scipy.special.logsumexp(logp + jnp.log(w + 1e-30), axis=-1)
