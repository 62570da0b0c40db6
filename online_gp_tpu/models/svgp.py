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
    # 1e-7 noise floor: same guard as the wiski likelihoods — an adam
    # step driving raw_noise far negative otherwise turns this into
    # log(0)/x/0 and poisons the next gradient
    noise = jnp.maximum(noise, 1e-7)
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
    eye = jnp.eye(z.shape[0], dtype=z.dtype)
    # Both covariances need an explicit floor: an f32 RBF gram over 256
    # clustered inducing points is routinely indefinite at the ~1e-5
    # scale, and the streaming correction's escalating jitter (1e-8 *
    # 10^2 max) cannot rescue a -1e-5 eigenvalue — the correction then
    # NaNs on the FIRST online step (observed under
    # variational_mode="closed_form" whose exact E-step leaves q(u)
    # collapsed, but the hazard is mode-independent since prior_cov is
    # Kzz either way).
    Kzz = model.kernel.matrix(params["kernel"], z, z) + 1e-5 * eye
    var_cov = _var_cov(params) + 1e-5 * eye
    return SVGPOldState(
        z=z,
        var_mean=jax.lax.stop_gradient(params["var_mean"]),
        var_cov=jax.lax.stop_gradient(var_cov),
        prior_mean=jax.lax.stop_gradient(_mean_fn(model, params, z)),
        prior_cov=jax.lax.stop_gradient(Kzz),
    )


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
    the Bui et al. streaming regularizer added to the minibatch ELBO.

    Computed as the DIFFERENCE of the two KLs directly, never as two
    separate KL evaluations: the -logdet(S0) term (S0 = q_new's
    covariance projected to old.z) cancels between them, so the difference
    needs NO factorization of S0 — only traces linear in S0. That matters
    because S0 is routinely numerically singular past any reasonable
    jitter (e.g. right after a closed-form E-step collapses q(u) onto the
    data) and its f32 Cholesky on TPU then NaNs the correction VALUE, not
    just the gradient (observed killing the quality-suite stream at
    variational_mode=closed_form on-chip while CPU survived).
    """
    mean, cov = svgp_predict(model, params, old.z, cfg, full_cov=True)
    L_q = psd_safe_cholesky(old.var_cov, jitter=1e-8)
    L_p = psd_safe_cholesky(old.prior_cov, jitter=1e-8)
    eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)
    tr_q = jnp.sum(cho_solve(L_q, cov) * eye)  # tr(S1^-1 S0), no chol(S0)
    tr_p = jnp.sum(cho_solve(L_p, cov) * eye)
    quad_q = jnp.sum(tri_solve(L_q, (old.var_mean - mean)[:, None]) ** 2)
    quad_p = jnp.sum(tri_solve(L_p, (old.prior_mean - mean)[:, None]) ** 2)
    diff = 0.5 * (
        (tr_q - tr_p) + (quad_q - quad_p) + chol_logdet(L_q) - chol_logdet(L_p)
    )
    return diff * online_beta / batch_size


@f32_matmuls
def svgp_closed_form_update(
    model: SVGPModel,
    params: Dict,
    new_x: jnp.ndarray,
    new_y: jnp.ndarray,
    new_z: Optional[jnp.ndarray] = None,
) -> Dict:
    """Closed-form O-SVGP variational update (Bui et al.): fold the old
    q(a) into pseudo-observations and recompute (m_b, S_b) exactly.

    The textbook form routes through D_a = (S_a^-1 - K_aa^-1)^-1 — a
    difference of inverses of two near-singular Grams, which in f32 is
    numerical garbage (observed eigenvalues spanning ±6e4 where the exact
    quantity is PSD; it silently destroyed the posterior within ~100
    single-point updates on the quality stream). Substituting
    D_a^-1 = S_a^-1 - K_aa^-1 back into the DTC normal equations cancels
    D_a everywhere, leaving the explicitly-PSD natural form

      A   = K_bb + K_bx K_xb / sigma^2 + K_ba S_a^-1 K_ab - K_ba K_aa^-1 K_ab
      rhs = K_bx y / sigma^2 + K_ba S_a^-1 m_a
      m_b = K_bb A^-1 rhs,    S_b = K_bb A^-1 K_bb

    (A >= 0 because K_bb - K_ba K_aa^-1 K_ab is a kernel Schur complement
    and the other two terms are Gram outer products). For the common
    z_b == z_a path the first and last terms cancel algebraically:
      A = K_ax K_xa / sigma^2 + K_aa S_a^-1 K_aa
    so neither K_aa^-1 nor the cancellation noise ever appears. Matches
    the update applied by the reference's
    ``online_gp/models/variational_gp_model.py::update_variational_parameters``.
    """
    jitter = model.jitter
    z_a = jax.lax.stop_gradient(params["z"])
    kp = jax.lax.stop_gradient(params["kernel"])
    noise = jnp.exp(jax.lax.stop_gradient(params.get("raw_noise", jnp.asarray(0.0))))

    M_a = z_a.shape[0]
    eye_a = jnp.eye(M_a, dtype=z_a.dtype)
    L_S = jnp.tril(jax.lax.stop_gradient(params["var_chol"]))
    m_a = jax.lax.stop_gradient(params["var_mean"])[:, None]
    K_aa = model.kernel.matrix(kp, z_a, z_a) + jitter * eye_a

    y = new_y.reshape(-1, 1)
    if new_z is None:
        z_b = z_a
        K_bx = model.kernel.matrix(kp, z_a, new_x)
        K_bb = K_aa
        W = tri_solve(L_S, K_aa)          # S_a^{-1/2} K_ab
        A = (K_bx @ K_bx.T) / noise + W.T @ W
        rhs = K_bx @ y / noise + K_aa @ cho_solve(L_S, m_a)
    else:
        z_b = jnp.asarray(new_z)
        eye_b = jnp.eye(z_b.shape[0], dtype=z_b.dtype)
        K_bx = model.kernel.matrix(kp, z_b, new_x)
        K_bb = model.kernel.matrix(kp, z_b, z_b) + jitter * eye_b
        K_ba = model.kernel.matrix(kp, z_b, z_a)
        L_K = psd_safe_cholesky(K_aa, jitter=jitter)
        W = tri_solve(L_S, K_ba.T)        # S_a^{-1/2} K_ab
        V = tri_solve(L_K, K_ba.T)        # K_aa^{-1/2} K_ab
        A = K_bb + (K_bx @ K_bx.T) / noise + W.T @ W - V.T @ V
        rhs = K_bx @ y / noise + K_ba @ cho_solve(L_S, m_a)

    A = 0.5 * (A + A.T)
    L_A = psd_safe_cholesky(A, jitter=jitter, tries=5)
    new_mean = (K_bb @ cho_solve(L_A, rhs))[:, 0]
    T = tri_solve(L_A, K_bb)              # A^{-1/2} K_bb
    new_cov = T.T @ T
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
