"""Online exact GP — the O(n^3) baseline with a static masked buffer.

Capability match for the reference's ``OnlineExactRegression`` /
``OnlineExactClassifier`` (botorch ``SingleTaskGP`` / ``FixedNoiseGP``
wrappers; ``online_gp/models/online_exact_{regression,classifier}.py``):
data grows point-by-point and every update is (append + one MLL step).

TPU design: growing shapes would retrace under jit, so data lives in a
fixed-capacity buffer with an active count; kernels are built over the
full buffer and inactive rows are masked to an identity block (their
quad/logdet contributions vanish exactly). Capacity doubles host-side —
log2(n) recompiles total instead of n.

Multi-output: hypers are batched (B leading dim, one independent GP per
output, botorch batch semantics) over shared inputs.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, tri_solve, chol_logdet
from online_gp_tpu.ops.precision import f32_matmuls

LOG_2PI = 1.8378770664093453


class ExactGPModel(NamedTuple):
    kernel: Kernel
    num_outputs: int = 1
    learn_noise: bool = True  # False => fixed per-point noise (FixedNoiseGP)
    jitter: float = 1e-6
    # (raw_param_name, prior) pairs added into the MLL like gpytorch's
    # registered priors (reference ``ExactMarginalLogLikelihood`` +
    # ``qnIPV_experiment.py:106-119`` Gamma priors on the exact arm)
    priors: Optional[tuple] = None

    def init_params(self, num_dims: int, dtype=jnp.float32, **kw) -> Dict:
        batch = (self.num_outputs,)
        params = {"kernel": self.kernel.init_params(num_dims, batch, dtype=dtype, **kw)}
        if self.learn_noise:
            params["raw_noise"] = jnp.full(batch, jnp.log(jnp.asarray(0.5)), dtype)
        return params


class ExactGPData(NamedTuple):
    x: jnp.ndarray  # (cap, d)
    y: jnp.ndarray  # (cap, B)
    noise: jnp.ndarray  # (cap, B) fixed per-point noise (ones when learned)
    mask: jnp.ndarray  # (cap,) 1.0 for active rows
    count: jnp.ndarray  # () int32


def exact_data_init(x, y, noise=None, capacity: Optional[int] = None) -> ExactGPData:
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n, d = x.shape
    B = y.shape[-1]
    cap = capacity or max(64, 1 << (n - 1).bit_length())
    if noise is None:
        noise = jnp.ones_like(y)
    xb = jnp.zeros((cap, d), x.dtype).at[:n].set(x)
    yb = jnp.zeros((cap, B), y.dtype).at[:n].set(y)
    nb = jnp.ones((cap, B), y.dtype).at[:n].set(noise)
    mask = jnp.zeros((cap,), x.dtype).at[:n].set(1.0)
    return ExactGPData(xb, yb, nb, mask, jnp.asarray(n, jnp.int32))


def exact_data_append(data: ExactGPData, x, y, noise=None) -> ExactGPData:
    """Append q points; grows capacity host-side when full."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    q = x.shape[0]
    if noise is None:
        noise = jnp.ones_like(y)
    n = int(data.count)
    cap = data.x.shape[0]
    if n + q > cap:
        new_cap = cap
        while new_cap < n + q:
            new_cap *= 2
        pad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((new_cap - cap,) + a.shape[1:], fill, a.dtype)], axis=0
        )
        data = ExactGPData(
            pad(data.x, 0), pad(data.y, 0), pad(data.noise, 1), pad(data.mask, 0), data.count
        )
    idx = jnp.arange(q) + data.count
    return ExactGPData(
        x=data.x.at[idx].set(x),
        y=data.y.at[idx].set(y),
        noise=data.noise.at[idx].set(noise),
        mask=data.mask.at[idx].set(1.0),
        count=data.count + q,
    )


def _masked_khat(model: ExactGPModel, params: Dict, data: ExactGPData) -> jnp.ndarray:
    """(B, cap, cap) effective covariance: active block = K + noise diag,
    inactive rows/cols = identity."""
    K = model.kernel.matrix(params["kernel"], data.x, data.x)  # (B, cap, cap)
    m = data.mask
    mm = m[:, None] * m[None, :]
    noise = data.noise.T  # (B, cap)
    if model.learn_noise:
        noise = jnp.exp(params["raw_noise"])[:, None] * noise
    diag = noise * m[None, :] + (1.0 - m)[None, :]
    cap = data.x.shape[0]
    eye = jnp.eye(cap, dtype=K.dtype)
    return K * mm[None] + diag[:, :, None] * eye


@f32_matmuls
def exact_gp_mll(model: ExactGPModel, params: Dict, data: ExactGPData) -> jnp.ndarray:
    """(B,) exact MLL / n over the active rows."""
    Khat = _masked_khat(model, params, data)
    L = psd_safe_cholesky(Khat, jitter=model.jitter)
    ym = (data.y * data.mask[:, None]).T[..., None]  # (B, cap, 1)
    alpha = tri_solve(L, ym)
    quad = jnp.sum(alpha * alpha, axis=(-2, -1))
    logdet = chol_logdet(L)
    n = data.count.astype(quad.dtype)
    res = -0.5 * (quad + logdet + n * LOG_2PI)
    if model.priors:
        from online_gp_tpu.kernels.priors import log_prior_sum

        res = res + log_prior_sum(
            dict(model.priors), params["kernel"], model.kernel.transforms
        )
    return res / n


@f32_matmuls
def exact_gp_posterior(
    model: ExactGPModel, params: Dict, data: ExactGPData, xt: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, t) posterior f-mean and variance at test points."""
    Khat = _masked_khat(model, params, data)
    L = psd_safe_cholesky(Khat, jitter=model.jitter)
    Kxt = model.kernel.matrix(params["kernel"], xt, data.x) * data.mask[None, :]  # (B, t, cap)
    ym = (data.y * data.mask[:, None]).T[..., None]
    alpha = cho_solve(L, ym)  # (B, cap, 1)
    mean = (Kxt @ alpha)[..., 0]
    v = tri_solve(L, Kxt.swapaxes(-1, -2))  # (B, cap, t)
    kdiag = model.kernel.outputscale(params["kernel"])[:, None] * jnp.ones(
        (1, xt.shape[0]), xt.dtype
    )
    var = kdiag - jnp.sum(v * v, axis=-2)
    return mean, jnp.maximum(var, 1e-12)


def exact_gp_observation_variance(model: ExactGPModel, params: Dict, var: jnp.ndarray, noise_scale=1.0):
    if model.learn_noise:
        return var + jnp.exp(params["raw_noise"])[:, None] * noise_scale
    return var
