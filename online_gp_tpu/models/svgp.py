"""Online / streaming SVGP (O-SVGP) — unwhitened variational GP core.

Functional re-design of the reference's ``VariationalGPModel``
(``online_gp/models/variational_gp_model.py``): gpytorch's
CholeskyVariationalDistribution + UnwhitenedVariationalStrategy become an
explicit parameter pytree

  params = { kernel hypers, mean_const, raw_noise (Gaussian lik.),
             z (M, d) inducing points, var_mean (M,), var_chol (M, M) }

with pure functions for the unwhitened predictive, the (streaming) ELBO,
and Bui et al. (1705.07131) streaming pieces:

- ``svgp_streaming_correction``: eqs 13-14 extra loss
  (KL[q_new(a)||q_old(a)] - KL[q_new(a)||p_old(a)]) * beta / n, with
  q_new(a) the current predictive at the *old* inducing points
  (reference ``mlls/streaming_added_loss_term.py`` +
  ``VariationalGPModel.add_streaming_loss``).
- ``svgp_snapshot``: freeze old variational dist / old prior / old z
  (``register_streaming_loss``, lines 95-115; includes the +1e-5 I
  covariance jitter at line 100).
- ``svgp_closed_form_update``: the full O-SVGP moment update from
  pseudo-observations (``update_variational_parameters``, lines 149-202).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, tri_solve, chol_logdet
from online_gp_tpu.likelihoods.bernoulli import bernoulli_probit_expected_log_prob
from online_gp_tpu.ops.precision import f32_matmuls

LOG_2PI = 1.8378770664093453


class SVGPModel(NamedTuple):
    kernel: Kernel
    likelihood: str = "gaussian"  # or "bernoulli"
    jitter: float = 1e-5
    constant_mean: bool = False  # ZeroMean in both reference regressors

    def init_params(
        self,
        inducing_points: jnp.ndarray,
        num_dims: Optional[int] = None,
        dtype=jnp.float32,
        **kw,
    ) -> Dict:
        z = jnp.asarray(inducing_points, dtype)
        M, d = z.shape
        params = {
            "kernel": self.kernel.init_params(num_dims or d, (), dtype=dtype, **kw),
            "z": z,
            "var_mean": jnp.zeros((M,), dtype),
            "var_chol": jnp.eye(M, dtype=dtype),
        }
        if self.likelihood == "gaussian":
            params["raw_noise"] = jnp.asarray(jnp.log(jnp.asarray(1.0)), dtype)
        if self.constant_mean:
            params["mean_const"] = jnp.zeros((), dtype)
        return params


def svgp_init_variational_to_prior(model: "SVGPModel", params: Dict) -> Dict:
    """Initialize q(u) = p(u) (gpytorch's unwhitened strategy does this at
    the first forward via ``variational_params_initialized``); materially
    improves conditioning of the grouped-lr optimization."""
    z = params["z"]
    Kzz = model.kernel.matrix(params["kernel"], z, z)
    out = dict(params)
    out["var_chol"] = psd_safe_cholesky(Kzz, jitter=model.jitter)
    return out


class SVGPOldState(NamedTuple):
    """Frozen snapshot for the streaming correction."""

    z: jnp.ndarray  # (M, d)
    var_mean: jnp.ndarray  # (M,)
    var_cov: jnp.ndarray  # (M, M)
    prior_mean: jnp.ndarray  # (M,)
    prior_cov: jnp.ndarray  # (M, M)


def _mean_fn(model: SVGPModel, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    if model.constant_mean:
        return jnp.broadcast_to(params["mean_const"], (x.shape[0],))
    return jnp.zeros((x.shape[0],), x.dtype)


def _var_cov(params: Dict) -> jnp.ndarray:
    L = jnp.tril(params["var_chol"])
    return L @ L.T


@f32_matmuls
def svgp_predict(
    model: SVGPModel,
    params: Dict,
    x: jnp.ndarray,
    cfg: SolverConfig = DEFAULT_CONFIG,
    full_cov: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Unwhitened predictive q(f(x)) = N(mu + Kxz Kzz^-1 (m - mu_z),
    Kxx - Kxz Kzz^-1 (Kzz - S) Kzz^-1 Kzx)."""
    z = params["z"]
    Kzz = model.kernel.matrix(params["kernel"], z, z)
    Kxz = model.kernel.matrix(params["kernel"], x, z)
    Lz = psd_safe_cholesky(Kzz, jitter=model.jitter)
    m_res = params["var_mean"] - _mean_fn(model, params, z)
    A = cho_solve(Lz, Kxz.T)  # Kzz^-1 Kzx: (M, n)
    mean = _mean_fn(model, params, x) + A.T @ m_res

    S = _var_cov(params)
    # cov = Kxx - A' Kzz A + A' S A  (unwhitened)
    half = tri_solve(Lz, Kxz.T)  # Lz^-1 Kzx
    SA = S @ A  # (M, n)
    if full_cov:
        Kxx = model.kernel.matrix(params["kernel"], x, x)
        cov = Kxx - half.T @ half + A.T @ SA
        return mean, cov
    kxx_diag = model.kernel.outputscale(params["kernel"]) * jnp.ones(x.shape[0], x.dtype)
    var = kxx_diag - jnp.sum(half * half, axis=0) + jnp.sum(A * SA, axis=0)
    return mean, jnp.maximum(var, 1e-10)


def gaussian_expected_log_prob(y, mean, var, noise):
    return -0.5 * (LOG_2PI + jnp.log(noise) + ((y - mean) ** 2 + var) / noise)


@f32_matmuls
def svgp_kl_to_prior(model: SVGPModel, params: Dict) -> jnp.ndarray:
    """KL(q(u) || p(u)) with p(u) = N(mu_z, Kzz)."""
    z = params["z"]
    Kzz = model.kernel.matrix(params["kernel"], z, z)
    Lp = psd_safe_cholesky(Kzz, jitter=model.jitter)
    Lq = jnp.tril(params["var_chol"])
    m_res = (params["var_mean"] - _mean_fn(model, params, z))[:, None]
    M = z.shape[0]
    half = tri_solve(Lp, Lq)  # Lp^-1 Lq
    trace = jnp.sum(half * half)
    quad = jnp.sum(tri_solve(Lp, m_res) ** 2)
    logdet_p = chol_logdet(Lp)
    logdet_q = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(Lq)) + 1e-20))
    return 0.5 * (trace + quad - M + logdet_p - logdet_q)


@f32_matmuls
def svgp_elbo(
    model: SVGPModel,
    params: Dict,
    x: jnp.ndarray,
    y: jnp.ndarray,
    num_data: int | jnp.ndarray,
    beta: float = 1.0,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Scaled variational ELBO / num_data (gpytorch ``VariationalELBO``
    convention: mean expected log-lik minus beta*KL/num_data)."""
    mean, var = svgp_predict(model, params, x, cfg)
    if model.likelihood == "gaussian":
        noise = jnp.exp(params["raw_noise"])
        ell = gaussian_expected_log_prob(y.reshape(-1), mean, var, noise)
    else:
        ell = bernoulli_probit_expected_log_prob(y.reshape(-1), mean, var)
    kl = svgp_kl_to_prior(model, params)
    return jnp.mean(ell) - beta * kl / num_data


# -- streaming pieces -------------------------------------------------------


@f32_matmuls
def svgp_snapshot(model: SVGPModel, params: Dict) -> SVGPOldState:
    """Freeze the current variational and prior distributions at z."""
    z = jax.lax.stop_gradient(params["z"])
    Kzz = model.kernel.matrix(params["kernel"], z, z)
    var_cov = _var_cov(params) + 1e-5 * jnp.eye(z.shape[0], dtype=z.dtype)
    return SVGPOldState(
        z=z,
        var_mean=jax.lax.stop_gradient(params["var_mean"]),
        var_cov=jax.lax.stop_gradient(var_cov),
        prior_mean=jax.lax.stop_gradient(_mean_fn(model, params, z)),
        prior_cov=jax.lax.stop_gradient(Kzz),
    )


def _kl_mvn(m0, S0, m1, S1, jitter=1e-8):
    """KL(N(m0,S0) || N(m1,S1)) for dense covariances."""
    k = m0.shape[-1]
    L1 = psd_safe_cholesky(S1, jitter=jitter)
    L0 = psd_safe_cholesky(S0, jitter=jitter)
    half = tri_solve(L1, L0)
    trace = jnp.sum(half * half)
    quad = jnp.sum(tri_solve(L1, (m1 - m0)[:, None]) ** 2)
    return 0.5 * (trace + quad - k + chol_logdet(L1) - chol_logdet(L0))


@f32_matmuls
def svgp_streaming_correction(
    model: SVGPModel,
    params: Dict,
    old: SVGPOldState,
    batch_size: int | jnp.ndarray,
    online_beta: float = 1.0,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """(KL[q_new(a) || q_old(a)] - KL[q_new(a) || p_old(a)]) * beta / n —
    the Bui et al. streaming regularizer added to the minibatch ELBO."""
    mean, cov = svgp_predict(model, params, old.z, cfg, full_cov=True)
    cov = cov + model.jitter * jnp.eye(cov.shape[-1], dtype=cov.dtype)
    kl_qq = _kl_mvn(mean, cov, old.var_mean, old.var_cov)
    kl_qp = _kl_mvn(mean, cov, old.prior_mean, old.prior_cov)
    return (kl_qq - kl_qp) * online_beta / batch_size


@f32_matmuls
def svgp_closed_form_update(
    model: SVGPModel,
    params: Dict,
    new_x: jnp.ndarray,
    new_y: jnp.ndarray,
    new_z: Optional[jnp.ndarray] = None,
) -> Dict:
    """Closed-form O-SVGP variational update (Bui et al.): convert the old
    q(a) into pseudo-observations and recompute (m_b, S_b) exactly.

      D_a   = (S_a^-1 - K_aa^-1)^-1
      y_hat = [y ; D_a S_a^-1 m_a],  Sigma = blockdiag(sigma^2 I, D_a)
      C     = K_fb K_bb^-1 K_bf + Sigma   over stacked (x, a)
      m_b   = K_bf C^-1 y_hat,   S_b = K_bb - K_bf C^-1 K_fb
    """
    jitter = model.jitter
    z_a = jax.lax.stop_gradient(params["z"])
    z_b = z_a if new_z is None else jnp.asarray(new_z)
    kp = jax.lax.stop_gradient(params["kernel"])
    noise = jnp.exp(jax.lax.stop_gradient(params.get("raw_noise", jnp.asarray(0.0))))

    M_a = z_a.shape[0]
    eye_a = jnp.eye(M_a, dtype=z_a.dtype)
    S_a = _var_cov(params)
    m_a = params["var_mean"][:, None]
    K_aa = model.kernel.matrix(kp, z_a, z_a) + jitter * eye_a

    # D_a_inv = S_a^-1 - K_aa^-1 can be near-singular in directions where
    # q(u) has collapsed to the prior; solve against a relatively
    # regularized D_a_inv instead of forming explicit inverses.
    S_a_inv = jnp.linalg.inv(S_a + jitter * eye_a)
    K_aa_inv = jnp.linalg.inv(K_aa)
    D_a_inv = S_a_inv - K_aa_inv
    reg = 1e-4 * jnp.maximum(jnp.mean(jnp.abs(jnp.diagonal(D_a_inv))), 1e-6)
    D_a_inv = D_a_inv + reg * eye_a
    D_a = jnp.linalg.solve(D_a_inv, eye_a)
    pseudo = jnp.linalg.solve(D_a_inv, S_a_inv @ m_a)

    n = new_x.shape[0]
    y_hat = jnp.concatenate([new_y.reshape(-1, 1), pseudo], axis=0)
    sigma_top = noise * jnp.eye(n, dtype=new_x.dtype)
    zeros = jnp.zeros((n, z_a.shape[0]), dtype=new_x.dtype)
    sigma_hat = jnp.block([[sigma_top, zeros], [zeros.T, D_a]])

    stacked = jnp.concatenate([new_x, z_a], axis=0)
    K_fb = model.kernel.matrix(kp, stacked, z_b)
    K_bb = model.kernel.matrix(kp, z_b, z_b) + jitter * jnp.eye(z_b.shape[0], dtype=z_b.dtype)
    Lb = psd_safe_cholesky(K_bb, jitter=jitter)
    # C can be indefinite (D_a is a difference of natural parameters), so
    # use an LU solve like the reference's torch.solve, not a Cholesky.
    C = K_fb @ cho_solve(Lb, K_fb.T) + sigma_hat
    new_mean = (K_fb.T @ jnp.linalg.solve(C, y_hat))[:, 0]
    new_cov = K_bb - K_fb.T @ jnp.linalg.solve(C, K_fb)
    new_cov = 0.5 * (new_cov + new_cov.T)
    new_chol = psd_safe_cholesky(new_cov, jitter=jitter, tries=5)

    out = dict(params)
    out["z"] = z_b
    out["var_mean"] = new_mean
    out["var_chol"] = new_chol
    return out


@f32_matmuls
def svgp_exact_estep(
    model: SVGPModel,
    params: Dict,
    x: jnp.ndarray,
    y: jnp.ndarray,
) -> Dict:
    """Batch-optimal q(u) given the current hypers (the variational-EM
    E-step over a full dataset).

    The ELBO's optimum in (m, S) for fixed hypers is Titsias' collapsed
    posterior — with ``Sigma = Kzz + Kzf Kfz / sigma^2``:

      S = Kzz Sigma^-1 Kzz,   m = Kzz Sigma^-1 Kzf y / sigma^2

    Equivalent to :func:`svgp_closed_form_update` from a prior-reset q(a)
    (whose pseudo-observations then carry no information), but O(n m^2)
    instead of O((n+m)^3) and independent of the current variational
    state. Used by ``OnlineSVGPRegression(variational_mode="closed_form")``
    during batch ``fit`` — the reference trains q(u) only by gradient
    (``online_svgp_regression.py:57-91``), which stalls at small n; this
    is the documented EM alternative.
    """
    z = jax.lax.stop_gradient(params["z"])
    kp = jax.lax.stop_gradient(params["kernel"])
    noise = jnp.exp(jax.lax.stop_gradient(params.get("raw_noise", jnp.asarray(0.0))))
    M = z.shape[0]
    eye = jnp.eye(M, dtype=z.dtype)
    Kzz = model.kernel.matrix(kp, z, z) + model.jitter * eye
    Kzf = model.kernel.matrix(kp, z, x)  # (M, n)
    Sigma = Kzz + (Kzf @ Kzf.T) / noise
    Ls = psd_safe_cholesky(Sigma, jitter=model.jitter)
    half = cho_solve(Ls, Kzz)  # Sigma^-1 Kzz, (M, M)
    S = Kzz @ half
    m = (Kzz @ cho_solve(Ls, Kzf @ y.reshape(-1, 1))) / noise
    out = dict(params)
    out["var_mean"] = m[:, 0]
    out["var_chol"] = psd_safe_cholesky(0.5 * (S + S.T), jitter=model.jitter, tries=5)
    return out
