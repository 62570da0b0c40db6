"""Streaming SGPR (O-SGPR) — Bui et al. collapsed streaming sparse GP.

Functional re-design of the reference's ``StreamingSGPR`` +
``StreamingSGPRBound`` (``online_gp/models/streaming_sgpr.py``, itself a
port of thangbui/streaming_sparse_gp osgpr.py). The object graph
(model rebuilt per update holding frozen ``old_strat/old_kernel/
old_C_matrix``) becomes an explicit old-state pytree carried through a
pure ``sgpr_absorb`` transition:

  C_b = K_bf K_fb / sigma^2 + (K_aa_old^-1 K_ab)^T C_a (K_aa_old^-1 K_ab)
  c_b = K_bf y / sigma^2 + K_ba K_aa_old^-1 m_a
        + (K_aa_old^-1 K_ab)^T C_a K_aa_old^-1 m_a
  m_b = K_bb (K_bb + C_b)^-1 c_b,  S_b = K_bb (K_bb + C_b)^-1 K_bb

with the collapsed streaming evidence bound ``sgpr_bound`` (log-prob of
[y; pseudotargets] under blockdiag(Q1+sigma^2 I, Q2+Sigma2) plus trace
corrections; reference lines 189-256) as the hyper objective.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, tri_solve, chol_logdet
from online_gp_tpu.ops.precision import f32_matmuls

LOG_2PI = 1.8378770664093453


class SGPRModel(NamedTuple):
    kernel: Kernel
    jitter: float = 1e-4

    def init_params(self, inducing_points: jnp.ndarray, num_dims: Optional[int] = None, dtype=jnp.float32, **kw) -> Dict:
        z = jnp.asarray(inducing_points, dtype)
        return {
            "kernel": self.kernel.init_params(num_dims or z.shape[-1], (), dtype=dtype, **kw),
            "z": z,
            "raw_noise": jnp.zeros((), dtype),
        }


class SGPROldState(NamedTuple):
    """Frozen previous-round quantities (the reference's old_strat /
    old_kernel / old_C_matrix trio, detached)."""

    z: jnp.ndarray  # (M, d)
    var_mean: jnp.ndarray  # (M,)
    kernel_params: Dict  # old kernel hypers (detached copy)
    C: jnp.ndarray  # (M, M)
    c: jnp.ndarray  # (M, 1) accumulated information vector (exact-path)


class SGPRMoments(NamedTuple):
    var_mean: jnp.ndarray  # (M,)
    var_chol: jnp.ndarray  # (M, M) lower chol of S_b


def _jeye(n, dtype, eps):
    return eps * jnp.eye(n, dtype=dtype)


@f32_matmuls
def sgpr_c_matrix(model: SGPRModel, params: Dict, old: Optional[SGPROldState], x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``current_C_matrix`` (lines 60-81)."""
    sigma2 = jnp.exp(params["raw_noise"])
    z_b = params["z"]
    Kbf = model.kernel.matrix(params["kernel"], z_b, x)
    C = Kbf @ Kbf.T / sigma2
    if old is not None:
        Kaa_old = model.kernel.matrix(old.kernel_params, old.z, old.z)
        Kaa_old = Kaa_old + _jeye(old.z.shape[0], C.dtype, model.jitter)
        La = psd_safe_cholesky(Kaa_old, jitter=model.jitter)
        Kab = model.kernel.matrix(params["kernel"], old.z, z_b)
        P = cho_solve(La, Kab)  # K_aa_old^-1 K_ab
        C = C + P.T @ old.C @ P
    return C


@f32_matmuls
def sgpr_c_vec(model: SGPRModel, params: Dict, old: Optional[SGPROldState], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Reference ``current_c_vec`` (lines 83-106)."""
    sigma2 = jnp.exp(params["raw_noise"])
    z_b = params["z"]
    Kbf = model.kernel.matrix(params["kernel"], z_b, x)
    c = Kbf @ y.reshape(-1, 1) / sigma2
    if old is not None:
        Kaa_old = model.kernel.matrix(old.kernel_params, old.z, old.z)
        Kaa_old = Kaa_old + _jeye(old.z.shape[0], c.dtype, model.jitter)
        La = psd_safe_cholesky(Kaa_old, jitter=model.jitter)
        ma = old.var_mean[:, None]
        Kab = model.kernel.matrix(params["kernel"], old.z, z_b)
        Kaa_inv_ma = cho_solve(La, ma)
        P = cho_solve(La, Kab)
        c = c + Kab.T @ Kaa_inv_ma + P.T @ (old.C @ Kaa_inv_ma)
    return c


@f32_matmuls
def sgpr_pseudotargets(model: SGPRModel, old: SGPROldState) -> jnp.ndarray:
    """K_aa_old C_old^-1 m_a + m_a (reference lines 108-119)."""
    Kaa_old = model.kernel.matrix(old.kernel_params, old.z, old.z)
    Lc = psd_safe_cholesky(old.C + _jeye(old.C.shape[0], old.C.dtype, model.jitter), jitter=model.jitter)
    ma = old.var_mean[:, None]
    return Kaa_old @ cho_solve(Lc, ma) + ma


@f32_matmuls
def sgpr_moments_from(model: SGPRModel, params: Dict, C: jnp.ndarray, c: jnp.ndarray) -> SGPRMoments:
    """m_b = K_bb (K_bb + C)^-1 c,  S_b = K_bb (K_bb + C)^-1 K_bb."""
    z_b = params["z"]
    Kbb = model.kernel.matrix(params["kernel"], z_b, z_b)
    L = psd_safe_cholesky(Kbb + C, jitter=model.jitter)
    m_b = (Kbb @ cho_solve(L, c))[:, 0]
    S_b = Kbb @ cho_solve(L, Kbb)
    S_chol = psd_safe_cholesky(S_b, jitter=model.jitter)
    return SGPRMoments(var_mean=m_b, var_chol=S_chol)


@f32_matmuls
def sgpr_moments(model: SGPRModel, params: Dict, old: Optional[SGPROldState], x: jnp.ndarray, y: jnp.ndarray) -> SGPRMoments:
    """Closed-form (m_b, S_b) (reference ``_update_variational_moments``)."""
    C = sgpr_c_matrix(model, params, old, x)
    c = sgpr_c_vec(model, params, old, x, y)
    return sgpr_moments_from(model, params, C, c)


@f32_matmuls
def sgpr_absorb(
    model: SGPRModel,
    params: Dict,
    old: Optional[SGPROldState],
    moments: Optional[SGPRMoments],
    x: jnp.ndarray,
    y: jnp.ndarray,
    new_z: Optional[jnp.ndarray] = None,
    rebase: bool = True,
) -> Tuple[Dict, SGPROldState, SGPRMoments]:
    """The reference's ``get_fantasy_model`` as a pure transition
    (``streaming_sgpr.py:143-177``), with its batch double-count fixed:
    C_total/c_total (prior rounds once + this batch once) produce both the
    fresh variational moments and the frozen old state for the next round.
    The pair (z_a, m_a, C_a) exactly reconstructs the information vector
    in the next round's ``sgpr_c_vec`` (c2 + c3 = m_a + C_a K_aa^-1 m_a),
    so the recursion is self-consistent. (The ``moments`` argument is
    unused now; kept for API continuity.)
    """
    del moments
    if rebase or old is None:
        # hypers/z changed since the last absorb: re-express the stored
        # information through the reference's K_aa_old^-1 projections.
        C_total = jax.lax.stop_gradient(sgpr_c_matrix(model, params, old, x))
        c_total = jax.lax.stop_gradient(sgpr_c_vec(model, params, old, x, y))
    else:
        # exact fast path (no hyper/z drift): information adds with zero
        # projection leakage — C_total = C1 + C_old, c_total = c1 + c_old.
        sigma2 = jnp.exp(params["raw_noise"])
        Kbf = model.kernel.matrix(params["kernel"], params["z"], x)
        C_total = jax.lax.stop_gradient(old.C + Kbf @ Kbf.T / sigma2)
        c_total = jax.lax.stop_gradient(old.c + Kbf @ y.reshape(-1, 1) / sigma2)
    new_moments = sgpr_moments_from(model, params, C_total, c_total)
    new_old = SGPROldState(
        z=jax.lax.stop_gradient(params["z"]),
        var_mean=jax.lax.stop_gradient(new_moments.var_mean),
        kernel_params=jax.lax.stop_gradient(params["kernel"]),
        C=C_total,
        c=c_total,
    )
    new_params = dict(params)
    if new_z is not None:
        # rebase the summarized information onto the moved inducing set:
        # an empty-batch round projects (m_a, C_a) from z_a to new_z.
        new_params["z"] = jnp.asarray(new_z)
        d = new_z.shape[-1]
        empty_x = jnp.zeros((0, d), x.dtype)
        empty_y = jnp.zeros((0,), y.dtype)
        C_new = jax.lax.stop_gradient(sgpr_c_matrix(model, new_params, new_old, empty_x))
        c_new = jax.lax.stop_gradient(sgpr_c_vec(model, new_params, new_old, empty_x, empty_y))
        new_moments = sgpr_moments_from(model, new_params, C_new, c_new)
        new_old = SGPROldState(
            z=jnp.asarray(new_z),
            var_mean=jax.lax.stop_gradient(new_moments.var_mean),
            kernel_params=new_old.kernel_params,
            C=C_new,
            c=c_new,
        )
    return new_params, new_old, new_moments


@f32_matmuls
def sgpr_predict(model: SGPRModel, params: Dict, moments: SGPRMoments, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unwhitened predictive from stored (m_b, S_b) — same strategy as SVGP."""
    z = params["z"]
    Kzz = model.kernel.matrix(params["kernel"], z, z) + _jeye(z.shape[0], x.dtype, model.jitter)
    Kxz = model.kernel.matrix(params["kernel"], x, z)
    Lz = psd_safe_cholesky(Kzz, jitter=model.jitter)
    A = cho_solve(Lz, Kxz.T)
    mean = A.T @ moments.var_mean
    half = tri_solve(Lz, Kxz.T)
    Ls = jnp.tril(moments.var_chol)
    SA = Ls.T @ A
    kxx_diag = model.kernel.outputscale(params["kernel"]) * jnp.ones(x.shape[0], x.dtype)
    var = kxx_diag - jnp.sum(half * half, axis=0) + jnp.sum(SA * SA, axis=0)
    return mean, jnp.maximum(var, 1e-10)


@f32_matmuls
def sgpr_bound(
    model: SGPRModel,
    params: Dict,
    old: Optional[SGPROldState],
    x: jnp.ndarray,
    y: jnp.ndarray,
    combine_terms: bool = True,
):
    """Collapsed streaming evidence bound (reference ``StreamingSGPRBound``).

    First round (no old state): the standard collapsed SGPR bound —
    log N(y; 0, Q1 + sigma^2 I) / n  - trace correction.
    Later rounds: log-prob of [y; pseudotargets] under
    blockdiag(Q1 + sigma^2 I, Q2 + Sigma2) plus both trace terms.
    """
    jitter = model.jitter
    sigma2 = jnp.exp(params["raw_noise"])
    z_b = params["z"]
    n = x.shape[0]
    Kbf = model.kernel.matrix(params["kernel"], z_b, x)
    Kbb = model.kernel.matrix(params["kernel"], z_b, z_b) + _jeye(z_b.shape[0], x.dtype, jitter)
    Lb = psd_safe_cholesky(Kbb, jitter=jitter)
    Q1 = Kbf.T @ cho_solve(Lb, Kbf)

    kff_diag = model.kernel.outputscale(params["kernel"]) * jnp.ones(n, x.dtype)
    t1 = jnp.sum(kff_diag - jnp.diagonal(Q1)) / sigma2

    def logprob(cov, resid):
        L = psd_safe_cholesky(cov + _jeye(cov.shape[0], cov.dtype, jitter), jitter=jitter)
        quad = jnp.sum(tri_solve(L, resid[:, None]) ** 2)
        return -0.5 * (quad + chol_logdet(L) + resid.shape[0] * LOG_2PI)

    if old is None:
        covar = Q1 + sigma2 * jnp.eye(n, dtype=x.dtype)
        logp = logprob(covar, y.reshape(-1)) / n
        trace = -t1 / 2.0 / n
        if combine_terms:
            return logp + trace
        return logp, trace, t1 / n, jnp.zeros(())

    z_a = old.z
    Kba = model.kernel.matrix(params["kernel"], z_b, z_a)
    Kaa_old = model.kernel.matrix(old.kernel_params, z_a, z_a)
    Q2 = Kba.T @ cho_solve(Lb, Kba)
    Lc = psd_safe_cholesky(old.C + _jeye(old.C.shape[0], x.dtype, jitter), jitter=jitter)
    Sigma2 = Kaa_old @ cho_solve(Lc, Kaa_old) + _jeye(z_a.shape[0], x.dtype, jitter)

    M_a = z_a.shape[0]
    zeros = jnp.zeros((n, M_a), x.dtype)
    Q = jnp.block([[Q1, zeros], [zeros.T, Q2]])
    Sigma = jnp.block([[sigma2 * jnp.eye(n, dtype=x.dtype), zeros], [zeros.T, Sigma2]])
    pseudo = sgpr_pseudotargets(model, old)[:, 0]
    y_hat = jnp.concatenate([y.reshape(-1), pseudo])
    num_data = n + M_a
    logp = logprob(Q + Sigma, y_hat) / num_data

    LS2 = psd_safe_cholesky(Sigma2, jitter=jitter)
    Kaa = model.kernel.matrix(params["kernel"], z_a, z_a)
    t2 = jnp.trace(cho_solve(LS2, Kaa)) - jnp.trace(cho_solve(LS2, Q2))
    trace = -(t1 + t2) / 2.0 / num_data
    if combine_terms:
        return logp + trace
    return logp, trace, t1 / num_data, t2 / num_data


def sgpr_resample_z(params: Dict, x_new: jnp.ndarray, resample_ratio: float, key) -> jnp.ndarray:
    """Inducing-point refresh on absorb (reference get_fantasy_model lines
    143-158): tiny uniform perturbation + swap a fraction for new data."""
    z = params["z"]
    k1, k2, k3 = jax.random.split(key, 3)
    z = z + jax.random.uniform(k1, z.shape, minval=-1e-4, maxval=1e-4, dtype=z.dtype)
    num = int(min(resample_ratio * z.shape[0], x_new.shape[0]))
    if num <= 0:
        return z
    z_idx = jax.random.permutation(k2, z.shape[0])[:num]
    x_idx = jax.random.permutation(k3, x_new.shape[0])[:num]
    return z.at[z_idx].set(x_new[x_idx])
