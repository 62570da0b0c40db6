"""WISKI — constant-time online SKI GP as a functional JAX core.

Re-design of the reference's ``FixedNoiseOnlineSKIGP``
(``online_gp/models/batched_fixed_noise_online_gp.py``) around an immutable
O(m^2) cache pytree and pure jittable transforms:

  state ("kernel cache", reference lines 31-60/140):
    wty      = W D^{-1} y          (B, m, 1)   "interpolation_cache"
    ydy      = y^T D^{-1} y        (B,)        "response_cache"
    roots    = RootCache over A = W D^{-1} W^T (B, m, m)  "WtW"
    d_logdet = log|D|              (B,)
    num_data = n                   ()

  transforms:
    wiski_init       <- constructor cache build  (reference lines 140-152)
    wiski_condition  <- condition_on_observations(inplace) (lines 258-285)
    wiski_mll        <- BatchedWoodburyMarginalLogLikelihood
                        (``online_gp/mlls/batched_woodbury_marginal_log_likelihood.py``)
    wiski_prediction_caches / wiski_predict <- eval forward (lines 204-256,
                        334-404)
    wiski_fantasize  <- get_fantasy_model batched cache expansion
                        (lines 287-332)

All math is derived in SURVEY.md §2.2-2.3. B is the output/class batch
(``num_outputs`` folded into ``_batch_shape`` in the reference); streaming
is ``lax.scan`` over ``wiski_condition``.

The learnable "second noise" sigma^2 is the reference's multiplicative
``FNMGLikelihood`` (``online_gp/likelihoods/fnmg_likelihood.py``): the
effective model is  y ~ N(0, W^T Kuu W + sigma^2 D)  with per-point fixed
noise D cached and the global sigma^2 learned; Kuu is divided by sigma^2
inside all cache algebra and the predictive covariance is re-scaled by
sigma^2 at the end (reference lines 227-228, 338-341).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.kernels.grid_kernel import grid_kuu_dense, grid_kuu_mvm
from online_gp_tpu.kernels.priors import log_prior_sum
from online_gp_tpu.ops.cg import batched_cg, lanczos, lanczos_root, slq_logdet
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.interp import interp_coeffs, dense_w, gather_predict, interp_matvec
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, chol_logdet, tri_solve
from online_gp_tpu.ops.root_update import (
    RootCache,
    root_cache_expand,
    root_cache_init,
    root_cache_rebuild_mat,
    root_cache_slim,
    root_cache_update,
)

LOG_2PI = 1.8378770664093453


class WiskiModel(NamedTuple):
    """Static model spec (hashable pieces only; pass as a closure/static arg)."""

    kernel: Kernel
    grid: Grid
    num_outputs: int
    learn_additional_noise: bool = False
    priors: Optional[tuple] = None  # tuple of (raw_param_name, prior) pairs

    def init_params(self, num_dims: int, dtype=jnp.float32, **kw) -> Dict:
        batch = (self.num_outputs,)
        params = {"kernel": self.kernel.init_params(num_dims, batch, dtype=dtype, **kw)}
        if self.learn_additional_noise:
            params["raw_second_noise"] = jnp.zeros(batch, dtype)
        return params


class WiskiState(NamedTuple):
    wty: jnp.ndarray  # (B, m, 1)
    ydy: jnp.ndarray  # (B,)
    roots: RootCache  # arrays (B, m, m)
    d_logdet: jnp.ndarray  # (B,)
    num_data: jnp.ndarray  # () int32


def _second_noise(model: WiskiModel, params: Dict) -> Optional[jnp.ndarray]:
    if model.learn_additional_noise:
        return jnp.exp(params["raw_second_noise"])  # (B,)
    return None


def _reshape_obs(y: jnp.ndarray, noise: jnp.ndarray, num_outputs: int):
    """Normalize targets/noise to (n, B)."""
    y = y.reshape(-1, num_outputs)
    noise = noise.reshape(-1, num_outputs)
    return y, noise


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def wiski_init(
    model: WiskiModel,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    root_jitter: float = 1e-4,
    chunk: int = 4096,
    detach_interp: bool = False,
) -> WiskiState:
    """Build the O(m^2) caches from initial data (then the data can go).

    Args:
      x: (n, D) inputs (stem features).
      y: (n, B) targets.
      noise: (n, B) fixed per-point noise diagonal.
    """
    B = model.num_outputs
    m = model.grid.num_points
    y, noise = _reshape_obs(y, noise, B)
    n = x.shape[0]
    dtype = x.dtype

    wty = jnp.zeros((B, m, 1), dtype)
    ydy = jnp.zeros((B,), dtype)
    A = jnp.zeros((B, m, m), dtype)

    with jax.default_matmul_precision("float32"):
        for start in range(0, n, chunk):
            xs = x[start : start + chunk]
            ys = y[start : start + chunk]
            ns = noise[start : start + chunk]
            idx, w = interp_coeffs(model.grid, xs, detach=detach_interp)
            wt = dense_w(idx, w, m)  # (m, c)
            dinv_y = ys / ns  # (c, B)
            wty = wty + jnp.einsum("mc,cb->bm", wt, dinv_y)[..., None]
            ydy = ydy + jnp.sum(ys * dinv_y, axis=0)
            A = A + jnp.einsum("mc,cb,kc->bmk", wt, 1.0 / ns, wt)

    d_logdet = jnp.sum(jnp.log(noise), axis=0)  # (B,)
    roots = root_cache_init(A, jitter=root_jitter)
    return WiskiState(wty=wty, ydy=ydy, roots=roots, d_logdet=d_logdet, num_data=jnp.asarray(n, jnp.int32))


# ---------------------------------------------------------------------------
# condition (the constant-time online update — THE hot op)
# ---------------------------------------------------------------------------


def wiski_condition(
    model: WiskiModel,
    state: WiskiState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    detach_interp: bool = True,
) -> WiskiState:
    """Absorb q new observations in O(m^2 q).

    Mirrors ``condition_on_observations(..., inplace=True)`` +
    ``_update_cache_dicts`` (reference lines 155-171, 258-273), including
    the noise clamp at 1e-7 before the root update (line 163).
    """
    idx, w = interp_coeffs(model.grid, x, detach=detach_interp)
    return wiski_condition_coeffs(model, state, idx, w, y, noise, detach_interp)


def wiski_condition_coeffs(
    model: WiskiModel,
    state: WiskiState,
    idx: jnp.ndarray,
    w: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    detach_interp: bool = True,
) -> WiskiState:
    """:func:`wiski_condition` given precomputed interpolation coefficients
    (``idx``/``w``: (q, P) from :func:`interp_coeffs`).

    Streaming callers should vectorize ``interp_coeffs`` over the whole
    stream BEFORE the ``lax.scan`` and scan over (idx, w, y, noise): the
    per-point stencil math is embarrassingly parallel, and leaving it
    inside the scan body costs more per step than the fused O(m^2) root
    update itself (many tiny sequential VPU ops vs one streaming kernel).
    """
    B = model.num_outputs
    m = model.grid.num_points
    y, noise = _reshape_obs(y, noise, B)
    q = idx.shape[0]

    root_noise = jnp.sqrt(jnp.maximum(noise, 1e-7))  # (q, B)
    dinv_y = y / noise  # (q, B)

    if q == 1:
        # Sparse-stencil fast path: the update vector v = W_x / sqrt(D) has
        # only P = 4^D nonzeros, so p = B^T v is a P-row gather of the
        # inverse root (O(P m) HBM traffic) and the Gram/wty updates are
        # P-sized scatters — the O(m^2) work reduces to the two fused
        # outer-product root updates (4 m^2 floats/update, one kernel).
        idx0, w0 = idx[0], w[0]  # (P,)
        rn0 = root_noise[0]  # (B,)
        with jax.default_matmul_precision("float32"):
            p = (
                jnp.einsum("p,bpm->bm", w0, state.roots.inv_root[:, idx0, :])
                / rn0[:, None]
            )  # (B, m)
        if (
            detach_interp
            and jax.default_backend() == "tpu"
            and state.roots.root.dtype == jnp.float32
        ):
            # fused Pallas kernel on the point-streaming hot path, batched
            # over outputs in one pallas_call (compile count independent of
            # the class batch); the differentiable path (fantasy
            # acquisitions, detach_interp=False) and non-f32 roots (jax
            # x64 parity oracles) stay on XLA.
            from online_gp_tpu.ops.pallas_root_update import pallas_rank1_apply_batched

            new_root, new_inv = pallas_rank1_apply_batched(
                state.roots.root, state.roots.inv_root, p
            )
        else:
            from online_gp_tpu.ops.root_update import roots_apply_rank1_p

            new_root, new_inv = roots_apply_rank1_p(
                state.roots.root, state.roots.inv_root, p
            )
        if state.roots.mat is None:
            new_mat = None
        else:
            outer = (w0[:, None] * w0[None, :])[None] / jnp.maximum(
                noise[0], 1e-7
            )[:, None, None]  # (B, P, P)
            new_mat = state.roots.mat.at[:, idx0[:, None], idx0[None, :]].add(outer)
        roots = RootCache(mat=new_mat, root=new_root, inv_root=new_inv)
        wty = state.wty.at[:, idx0, 0].add(w0[None, :] * dinv_y[0][:, None])
    else:
        w_cols = dense_w(idx, w, m)  # (m, q)
        v = w_cols[None, :, :] / root_noise.T[:, None, :]  # (B, m, q)
        roots = root_cache_update(state.roots, v)
        wty = state.wty + jnp.einsum("mq,qb->bm", w_cols, dinv_y)[..., None]

    ydy = state.ydy + jnp.sum(y * dinv_y, axis=0)
    d_logdet = state.d_logdet + jnp.sum(jnp.log(noise), axis=0)
    return WiskiState(
        wty=wty,
        ydy=ydy,
        roots=roots,
        d_logdet=d_logdet,
        num_data=state.num_data + q,
    )


def wiski_stream(
    model: WiskiModel,
    state: WiskiState,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    noises: jnp.ndarray,
    detach_interp: bool = True,
    block_size: int = 128,
) -> WiskiState:
    """Absorb a stream of n single points — one exact rank-1 root update
    per point, identical math and order to scanning ``wiski_condition`` —
    with every order-INdependent piece vectorized outside the sequential
    recursion (the TPU-shaped streaming plan):

    - interpolation stencils: one vectorized ``interp_coeffs`` call,
    - additive caches (wty / ydy / d_logdet / Gram accumulator): single
      bulk scatter-adds / reductions / matmuls over the whole stream,
    - the roots recursion: blocked into rank-``block_size`` chunks whose
      O(m^2) work is two MXU matmuls per chunk
      (:func:`online_gp_tpu.ops.root_update.roots_stream_blocked`); the
      only sequential work is an O(k m)-per-step factor recursion.

    Args:
      xs: (n, D); ys, noises: (n, B) (n*B elements — reshaped, not
        broadcast, like every other entry point's ``_reshape_obs``).
      block_size: deferred-update chunk rank; ``<= 1`` falls back to the
        per-step scan over the fused rank-1 kernel.

    Returns the conditioned state (bit-comparable to the sequential loop
    up to f32 reassociation in the bulk reductions).
    """
    B = model.num_outputs
    m = model.grid.num_points
    n = xs.shape[0]
    y = ys.reshape(n, B)
    noise = noises.reshape(n, B)
    idx, w = interp_coeffs(model.grid, xs, detach=detach_interp)  # (n, P)

    with jax.default_matmul_precision("float32"):
        # ---- order-independent additive caches, vectorized ----
        dinv_y = y / noise  # (n, B)
        from online_gp_tpu.ops.interp import wt_matvec

        wty = state.wty + wt_matvec(idx, w, dinv_y, m).T[..., None]  # (B, m, 1)
        ydy = state.ydy + jnp.sum(y * dinv_y, axis=0)
        d_logdet = state.d_logdet + jnp.sum(jnp.log(noise), axis=0)
        if state.roots.mat is None:
            new_mat = None
        else:
            # Gram accumulator A += W D^{-1} W^T, densified in bounded
            # 2048-point segments (the same chunking as ``wt_matvec``) so
            # bulk absorb is O(m^2 + chunk*m) memory regardless of stream
            # length — a 131k-point absorb at m=900 would otherwise
            # materialize a ~470 MB dense W.
            seg = 2048
            ninv = 1.0 / jnp.maximum(noise, 1e-7)  # (n, B)
            if n <= seg:
                wt = dense_w(idx, w, m)  # (m, n)
                new_mat = state.roots.mat + jnp.einsum("mc,cb,kc->bmk", wt, ninv, wt)
            else:
                pad = (-n) % seg
                P = idx.shape[1]
                idx_p = jnp.concatenate([idx, jnp.zeros((pad, P), idx.dtype)])
                w_p = jnp.concatenate([w, jnp.zeros((pad, P), w.dtype)])
                ninv_p = jnp.concatenate([ninv, jnp.zeros((pad, B), ninv.dtype)])
                nc = (n + pad) // seg

                def gram_chunk(acc, inp):
                    idx_s, w_s, ninv_s = inp
                    wt_s = dense_w(idx_s, w_s, m)  # (m, seg)
                    return acc + jnp.einsum("mc,cb,kc->bmk", wt_s, ninv_s, wt_s), 0.0

                new_mat, _ = jax.lax.scan(
                    gram_chunk,
                    state.roots.mat,
                    (
                        idx_p.reshape(nc, seg, P),
                        w_p.reshape(nc, seg, P),
                        ninv_p.reshape(nc, seg, B),
                    ),
                )

        # ---- sequential roots recursion (the only order-dependent part) ----
        rn = jnp.sqrt(jnp.maximum(noise, 1e-7))  # (n, B)
        if block_size > 1:
            from online_gp_tpu.ops.root_update import roots_stream_blocked_batched

            wv = w[None, :, :] / rn.T[:, :, None]  # (B, n, P)
            # one batched-over-outputs fused chunk kernel (grid over B);
            # the kernel has no autodiff rules, so the differentiable-
            # interp path (fantasy acquisitions) stays on XLA.
            root, inv_root = roots_stream_blocked_batched(
                state.roots.root,
                state.roots.inv_root,
                idx,
                wv,
                block=block_size,
                use_pallas=None if detach_interp else False,
            )
            return WiskiState(
                wty=wty,
                ydy=ydy,
                roots=RootCache(mat=new_mat, root=root, inv_root=inv_root),
                d_logdet=d_logdet,
                num_data=state.num_data + n,
            )
        use_pallas = (
            detach_interp
            and jax.default_backend() == "tpu"
            and state.roots.root.dtype == jnp.float32
        )

        def step(carry, inp):
            L, Binv = carry
            ii, wi, rni = inp  # (P,), (P,), (B,)
            p = jnp.einsum("p,bpm->bm", wi, Binv[:, ii, :]) / rni[:, None]
            if use_pallas:
                from online_gp_tpu.ops.pallas_root_update import (
                    pallas_rank1_apply_batched,
                )

                L, Binv = pallas_rank1_apply_batched(L, Binv, p)
            else:
                from online_gp_tpu.ops.root_update import roots_apply_rank1_p

                L, Binv = roots_apply_rank1_p(L, Binv, p)
            return (L, Binv), 0.0

        (root, inv_root), _ = jax.lax.scan(
            step, (state.roots.root, state.roots.inv_root), (idx, w, rn)
        )

    return WiskiState(
        wty=wty,
        ydy=ydy,
        roots=RootCache(mat=new_mat, root=root, inv_root=inv_root),
        d_logdet=d_logdet,
        num_data=state.num_data + n,
    )


def wiski_slim(state: WiskiState) -> WiskiState:
    """Opt into the slim streaming state: drop the exact Gram accumulator
    so the per-update HBM traffic is 4 m^2 floats instead of 6 (the hot
    rank-1 update then touches only the two maintained roots).

    Trade-off: ``wiski_refresh_roots`` on a slim state re-anchors to
    L L^T (exact algebraically, but carrying L's f32 drift) instead of the
    add-only Gram accumulator. Bounded by the same periodic-refresh policy;
    ``wiski_check_decomposition`` still validates B^T L = I."""
    return state._replace(roots=root_cache_slim(state.roots))


def wiski_unslim(state: WiskiState) -> WiskiState:
    """Rebuild the Gram accumulator (A = L L^T) for a slim state."""
    return state._replace(roots=root_cache_rebuild_mat(state.roots))


def wiski_refresh_roots(state: WiskiState, jitter: float = 1e-4) -> WiskiState:
    """Recompute the maintained roots from the exact Gram accumulator.

    The reference's ``check_decomposition`` flag (``online_gp/settings.py``)
    hints at verifying/refreshing the incremental decomposition; on TPU
    (f32) a periodic refresh bounds root drift over very long streams.

    Slim states (no accumulator) re-anchor to A = L L^T and stay slim.
    """
    slim = state.roots.mat is None
    roots = root_cache_init(root_cache_rebuild_mat(state.roots).mat, jitter=jitter)
    if slim:
        roots = root_cache_slim(roots)
    return state._replace(roots=roots)


def wiski_check_decomposition(state: WiskiState) -> Dict[str, jnp.ndarray]:
    """Decomposition health: ||LL' - A||_inf / ||A||_inf and ||L B' - I||_inf
    per output batch (diagnostic for the check_decomposition flag).

    On slim states (no Gram accumulator) the reconstruction check has no
    independent anchor (recon err is 0 by construction), so
    ``root_recon_rel_err`` is reported as NaN — the result schema is
    mode-independent, so monitors indexing either key never KeyError."""
    L, B, A = state.roots.root, state.roots.inv_root, state.roots.mat
    with jax.default_matmul_precision("float32"):
        ident = jnp.einsum("bij,bkj->bik", L, B)
    m = L.shape[-1]
    eye = jnp.eye(m, dtype=L.dtype)
    inv_err = jnp.max(jnp.abs(ident - eye), axis=(-2, -1))
    if A is None:
        return {
            "root_recon_rel_err": jnp.full_like(inv_err, jnp.nan),
            "inverse_root_err": inv_err,
        }
    with jax.default_matmul_precision("float32"):
        recon = jnp.einsum("bij,bkj->bik", L, L)
    recon_err = jnp.max(jnp.abs(recon - A), axis=(-2, -1)) / jnp.maximum(
        jnp.max(jnp.abs(A), axis=(-2, -1)), 1e-12
    )
    return {"root_recon_rel_err": recon_err, "inverse_root_err": inv_err}


# ---------------------------------------------------------------------------
# Woodbury MLL
# ---------------------------------------------------------------------------


def _kuu_eff(model: WiskiModel, params: Dict) -> jnp.ndarray:
    """K_uu, divided by the learnable second noise when present
    (reference ``Kuu`` property, lines 336-341)."""
    Kuu = grid_kuu_dense(model.kernel, params["kernel"], model.grid)  # (B, m, m)
    s2 = _second_noise(model, params)
    if s2 is not None:
        Kuu = Kuu / s2[..., None, None]
    return Kuu


def _shard_m_rows(a: jnp.ndarray, cfg: Optional[SolverConfig]):
    """Pin the m (row) dimension of a (B, m, ...) intermediate to the
    tensor-parallel mesh axis (``cfg.grid_shard_axis``), keeping GSPMD on
    the psum-over-shards plan instead of all-gathering operands. No-op
    when the axis is unset."""
    if cfg is None or cfg.grid_shard_axis is None:
        return a
    from jax.sharding import PartitionSpec as P

    spec = P(None, cfg.grid_shard_axis, *([None] * (a.ndim - 2)))
    return jax.lax.with_sharding_constraint(a, spec)


def _dense_inner_pieces(E, L, wty):
    """Forward of the dense Woodbury inner core (batched over outputs):

      Q = I + L^T E L,  proj = L^T E wty,  sol = Q^{-1} proj
      inner_qform = proj^T sol, inner_logdet = log|Q|, Kuu_wty = E wty
    """
    with jax.default_matmul_precision("float32"):
        EL = E @ L
        m = EL.shape[-1]
        Q = jnp.eye(m, dtype=EL.dtype) + jnp.einsum("bji,bjk->bik", L, EL)
        Lq = jnp.linalg.cholesky(Q)  # Q = I + PSD: well conditioned, no jitter
        Kw = E @ wty
        proj = jnp.einsum("bji,bjk->bik", L, Kw)
        sol = cho_solve(Lq, proj)
        qf = jnp.sum(proj * sol, axis=(-2, -1))
        ld = chol_logdet(Lq)
        return qf, ld, Kw, Lq, sol


@jax.custom_vjp
def _dense_inner_core(E, L, wty):
    """Dense Woodbury inner terms with a CLOSED-FORM backward.

    Reverse-mode AD of this block differentiates through the Cholesky
    factorization, whose adjoint (level-2 triangular ops + symmetrization)
    costs ~10x the forward on TPU — measured 1110 us/step vs a 108 us
    forward at m=900 (the reference pays the same through gpytorch's
    autograd, ``batched_woodbury_marginal_log_likelihood.py:19-52``).
    The matrix-calculus gradients need only products of quantities the
    forward already has:

      d inner_qform = tr(dE (w u^T + u w^T - u u^T)) with u = L sol, w = wty
      d log|Q|      = tr(dE (L Q^{-1} L^T))
      L/wty cotangents analogously (rank-1 or one extra m^3 matmul each,
      dead-code-eliminated by XLA when the caches are not differentiated).
    """
    qf, ld, Kw, _, _ = _dense_inner_pieces(E, L, wty)
    return qf, ld, Kw


def _dense_inner_fwd(E, L, wty):
    qf, ld, Kw, Lq, sol = _dense_inner_pieces(E, L, wty)
    return (qf, ld, Kw), (E, L, wty, Kw, Lq, sol)


def _dense_inner_bwd(res, cots):
    E, L, wty, Kw, Lq, sol = res
    cq, cl, cKw = cots  # (B,), (B,), (B, m, 1)
    # cotangent math runs at "high" (3-pass bf16) matmul precision: the
    # FORWARD Q build/Cholesky stay true-f32 (conditioning), but the
    # gradient products feed an Adam step at lr ~1e-2, where 3-pass
    # accuracy (~1e-6 rel) is far below the optimizer's own noise floor.
    # f64 inputs (CPU parity tests) are unaffected — precision contexts
    # only select TPU bf16 pass counts.
    with jax.default_matmul_precision("high"):
        Lt = jnp.swapaxes(L, -1, -2)
        u = L @ sol  # (B, m, 1)
        Eu = E @ u  # (B, m, 1)
        # ONE m-RHS triangular solve on the hot path:
        #   W := Lq^{-1} L^T  ->  L Q^{-1} L^T = W^T W  (syrk, MXU-friendly)
        # (TPU triangular solves are several times slower than matmuls, so
        # trading the second solve of cho_solve for a syrk matters here)
        W = tri_solve(Lq, Lt)  # (B, m, m)
        G_ld = jnp.einsum("bki,bkj->bij", W, W)  # L Q^{-1} L^T (symmetric)
        cq_ = cq[:, None, None]
        cl_ = cl[:, None, None]
        wuT = wty @ jnp.swapaxes(u, -1, -2)
        E_bar = (
            cq_ * (wuT + jnp.swapaxes(wuT, -1, -2) - u @ jnp.swapaxes(u, -1, -2))
            + cl_ * G_ld
            + 0.5 * (cKw @ jnp.swapaxes(wty, -1, -2) + wty @ jnp.swapaxes(cKw, -1, -2))
        )
        # cotangents for the caches: exact, but unused (hence DCE'd along
        # with their second solve) in the hyper-fit path where state is
        # held constant
        S = tri_solve(Lq, W, trans=True)  # (B, m, m) = Q^{-1} L^T
        ESt = E @ jnp.swapaxes(S, -1, -2)  # E L Q^{-1}
        L_bar = cq_ * 2.0 * ((Kw - Eu) @ jnp.swapaxes(sol, -1, -2)) + cl_ * 2.0 * ESt
        w_bar = cq_ * 2.0 * Eu + E @ cKw
    # cotangent dtypes must match the primals exactly (mixed f32 params /
    # f64 caches under jax x64 otherwise trip lax's strict dtype checks)
    return (E_bar.astype(E.dtype), L_bar.astype(L.dtype), w_bar.astype(wty.dtype))


_dense_inner_core.defvjp(_dense_inner_fwd, _dense_inner_bwd)


def _q_factor(model: WiskiModel, params: Dict, state: WiskiState,
              cfg: Optional[SolverConfig] = None):
    """Shared pieces: Kuu_eff, KuuL, chol(Q), proj = L^T Kuu W D^{-1} y.

    Matmul precision is pinned to true float32: Q's conditioning scales
    with num_data and bf16-pass accumulation on TPU can push it
    indefinite. Under ``cfg.grid_shard_axis`` the m x m intermediates stay
    m-row-sharded; Q itself (contracted over m) is replicated for the
    Cholesky."""
    with jax.default_matmul_precision("float32"):
        Kuu = _kuu_eff(model, params)
        L = state.roots.root
        KuuL = _shard_m_rows(Kuu @ L, cfg)  # (B, m, m)
        m = KuuL.shape[-1]
        Q = jnp.eye(m, dtype=KuuL.dtype) + jnp.einsum("bji,bjk->bik", L, KuuL)
        Lq = jnp.linalg.cholesky(Q)  # Q = I + PSD: well conditioned, no jitter
        Kuu_wty = _shard_m_rows(Kuu @ state.wty, cfg)  # (B, m, 1)
        proj = jnp.einsum("bji,bjk->bik", L, Kuu_wty)  # (B, m, 1)
        return Kuu, KuuL, Lq, Kuu_wty, proj


def _mll_inner_iterative(
    model: WiskiModel, params: Dict, state: WiskiState, cfg: SolverConfig,
    key: Optional[jnp.ndarray] = None,
):
    """CG/SLQ-backed inner MLL terms for m > max_cholesky_size.

    The reference reaches the same regime through gpytorch's
    ``inv_quad_logdet`` (CG solves + stochastic Lanczos quadrature when m
    exceeds ``max_cholesky_size``; ``config/regression.yaml:24-27``,
    ``mlls/batched_woodbury_marginal_log_likelihood.py:27-30``). Per output:

      inner_qform  = proj^T Q^{-1} proj           via batched CG
      inner_logdet = log|Q|                       via SLQ (value) with a
                     Hutchinson trace surrogate supplying the exact-in-
                     expectation gradient d log|Q| = tr(Q^{-1} dQ)
      Kuu_wty      = Kuu_eff (W D^{-1} y)         via the structured MVM

    Probe/iteration budgets come from cfg (max_cg_iterations, cg_tolerance,
    max_root_decomposition_size). The whole computation is vmapped over
    the output batch — one compiled CG/SLQ regardless of B.

    ``key`` seeds the SLQ/Hutchinson probes; ``None`` keeps the legacy
    deterministic-per-shape behavior (PRNGKey(0)). Long hyper-fits should
    fold the step counter in so the logdet estimate averages across probes
    over the optimization instead of chasing one fixed realization.
    """
    B = model.num_outputs
    m = state.roots.root.shape[-1]
    cg_iters = min(cfg.max_cg_iterations, m)
    slq_iters = min(cfg.max_root_decomposition_size, m, 64)
    num_probes = 32
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda b: jax.random.fold_in(key, b))(jnp.arange(B))

    s2 = _second_noise(model, params)
    s2_arr = jnp.ones((B,), state.roots.root.dtype) if s2 is None else s2

    def one_output(kp_b, s2_b, wty_b, L_b, key_b):
        if cfg.use_toeplitz:
            def kuu_mvm(x):
                return (
                    grid_kuu_mvm(model.kernel, kp_b, model.grid, x, use_toeplitz=True)
                    / s2_b
                )
        else:
            Kuu_b = grid_kuu_dense(model.kernel, kp_b, model.grid) / s2_b

            def kuu_mvm(x):
                return Kuu_b @ x

        def q_mvm(v):
            return v + L_b.T @ kuu_mvm(L_b @ v)

        kuu_wty = kuu_mvm(wty_b)  # (m, 1)
        proj = L_b.T @ kuu_wty  # (m, 1)
        sol = batched_cg(q_mvm, proj, max_iters=cg_iters, tol=cfg.cg_tolerance)
        qform = jnp.sum(proj * sol)

        # log|Q|: SLQ for the forward value; gradient from the Hutchinson
        # estimator E_z[ sg(Q^{-1} z)^T Q z ] whose derivative is
        # tr(Q^{-1} dQ) in expectation.
        slq_val = slq_logdet(
            lambda v: q_mvm(v[:, None])[:, 0],
            m,
            key_b,
            num_probes=num_probes,
            num_iters=slq_iters,
            dtype=L_b.dtype,
        )
        z = jax.random.rademacher(
            jax.random.fold_in(key_b, 1), (m, num_probes), dtype=L_b.dtype
        )
        qinv_z = jax.lax.stop_gradient(
            batched_cg(q_mvm, z, max_iters=cg_iters, tol=cfg.cg_tolerance)
        )
        surrogate = jnp.sum(qinv_z * q_mvm(z)) / num_probes
        logdet = jax.lax.stop_gradient(slq_val - surrogate) + surrogate
        return qform, logdet, kuu_wty

    with jax.default_matmul_precision("float32"):
        qforms, logdets, kuu_wtys = jax.vmap(one_output)(
            params["kernel"], s2_arr, state.wty, state.roots.root, keys
        )
    return qforms, logdets, kuu_wtys


def wiski_mll(
    model: WiskiModel,
    params: Dict,
    state: WiskiState,
    cfg: SolverConfig = DEFAULT_CONFIG,
    *,
    slq_key: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Exact GP marginal log-likelihood from the caches alone, per output.

    The Woodbury/matrix-determinant-lemma algebra of
    ``BatchedWoodburyMarginalLogLikelihood.__call__`` (reference
    ``online_gp/mlls/batched_woodbury_marginal_log_likelihood.py:19-52``):

      quad   = [y'D^{-1}y - (WD^{-1}y)' K (WD^{-1}y) + proj' Q^{-1} proj] / s2
      logdet = log|Q| + log|D| (+ n log s2)
      mll    = -(quad + logdet + n log 2pi)/2 + log p(theta);   returned /n

    Dispatches on ``cfg.max_cholesky_size``: dense Cholesky at or below it,
    batched CG + SLQ above it (the gpytorch ``inv_quad_logdet`` split the
    reference configures at ``config/regression.yaml:26``).

    Returns (B,) — callers sum over outputs like the reference wrappers.
    """
    m = state.roots.root.shape[-1]
    if m > cfg.max_cholesky_size:
        inner_qform, inner_logdet, Kuu_wty = _mll_inner_iterative(
            model, params, state, cfg, key=slq_key
        )
    elif cfg.grid_shard_axis is None:
        # closed-form-VJP core: the per-step hyper gradient avoids the
        # Cholesky adjoint (~10x the forward on TPU; see _dense_inner_core)
        inner_qform, inner_logdet, Kuu_wty = _dense_inner_core(
            _kuu_eff(model, params), state.roots.root, state.wty
        )
    else:
        # tensor-parallel path keeps _q_factor's explicit m-row sharding
        # annotations (custom_vjp would hide them from GSPMD)
        _, _, Lq, Kuu_wty, proj = _q_factor(model, params, state, cfg)
        sol = cho_solve(Lq, proj)
        inner_qform = jnp.sum(proj * sol, axis=(-2, -1))  # (B,)
        inner_logdet = chol_logdet(Lq)  # (B,)
    if cfg.skip_logdet_forward:
        # gpytorch semantics: zero in the forward value, gradient intact.
        inner_logdet = inner_logdet - jax.lax.stop_gradient(inner_logdet)

    inducing_qform = jnp.sum(state.wty * Kuu_wty, axis=(-2, -1))  # (B,)
    quad = state.ydy - inducing_qform + inner_qform
    logdet = inner_logdet + state.d_logdet

    n = state.num_data.astype(quad.dtype)
    final = n * LOG_2PI
    s2 = _second_noise(model, params)
    if s2 is not None:
        quad = quad / s2
        final = final + n * jnp.log(s2)

    res = -0.5 * (quad + logdet + final)
    if model.priors:
        res = res + log_prior_sum(
            dict(model.priors), params["kernel"], model.kernel.transforms
        )
    return res / n


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------


def wiski_prediction_caches(
    model: WiskiModel,
    params: Dict,
    state: WiskiState,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Grid-space predictive caches (reference ``prediction_cache``
    property, lines 369-404):

      mean_cache = K W D^{-1} y - (K L) Q^{-1} (L' K W D^{-1} y)   (B, m, 1)
      cov_cache  = K - (K L) Q^{-1} (K L)'                         (B, m, m)

    with K = Kuu / s2. In a jitted caller these are computed once per
    hyperparameter/state change and closed over for many predict calls.
    """
    _, KuuL, Lq, Kuu_wty, proj = _q_factor(model, params, state, cfg)
    m = KuuL.shape[-1]
    with jax.default_matmul_precision("float32"):
        mean_cache = Kuu_wty - KuuL @ cho_solve(Lq, proj)
        if cfg.skip_posterior_variances:
            return mean_cache, None
        Kuu = _kuu_eff(model, params)
        k = min(m, cfg.max_root_decomposition_size)
        if cfg.fast_pred_var and k < m:
            # LOVE-style fast variances (reference lines 393-397): a rank-k
            # Lanczos inverse root Rq of Q (Q^{-1} ~= Rq Rq^T), so
            # cov ~= Kuu - (KuuL Rq)(KuuL Rq)^T. Krylov start vector = proj
            # (the direction the predictive mean already solves along).
            # Vmapped over outputs — a B-class Dirichlet model compiles ONE
            # Lanczos program, not B.
            s2 = _second_noise(model, params)
            s2_arr = jnp.ones((model.num_outputs,), Lq.dtype) if s2 is None else s2

            def one_output_root(kp_b, s2_b, L_b, proj_b, KuuL_b):
                if cfg.use_toeplitz:
                    def kuu_mvm(x):
                        return (
                            grid_kuu_mvm(
                                model.kernel, kp_b, model.grid, x, use_toeplitz=True
                            )
                            / s2_b
                        )
                else:
                    Kuu_b = grid_kuu_dense(model.kernel, kp_b, model.grid) / s2_b

                    def kuu_mvm(x):
                        return Kuu_b @ x

                def q_mvm(v):
                    return v + L_b.T @ kuu_mvm(L_b @ v[:, None])[:, 0]

                Qlan, alphas, betas = lanczos(q_mvm, proj_b[:, 0], k)
                T = jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1)
                evals, evecs = jnp.linalg.eigh(T)
                evals = jnp.maximum(evals, 1e-10)
                Rq = Qlan.T @ (evecs / jnp.sqrt(evals)[None, :])  # (m, k)
                return KuuL_b @ Rq

            R = jax.vmap(one_output_root)(
                params["kernel"], s2_arr, state.roots.root, proj, KuuL
            )  # (B, m, k)
            cov_cache = Kuu - jnp.einsum("bik,bjk->bij", R, R)
        else:
            # exact path; R = Lq^{-1} (KuuL)^T is the same LOVE root at
            # full rank, so fast_pred_var with k >= m coincides with this.
            R = tri_solve(Lq, KuuL.swapaxes(-1, -2))  # (B, m, m)
            cov_cache = Kuu - jnp.einsum("bki,bkj->bij", R, R)
        return mean_cache, cov_cache


def wiski_predict(
    model: WiskiModel,
    params: Dict,
    state: WiskiState,
    x: jnp.ndarray,
    cfg: SolverConfig = DEFAULT_CONFIG,
    caches: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Posterior f-moments at test points (eval forward, lines 204-256).

    Returns:
      mean (B, n); var (B, n) (or None under skip_posterior_variances).
      The learnable second noise re-scales the covariance (lines 227-228);
      observation noise is NOT added (wrappers add it, matching
      ``OnlineSKIRegression.predict``, ``online_ski_regression.py:56-62``).
    """
    if caches is None:
        caches = wiski_prediction_caches(model, params, state, cfg)
    mean_cache, cov_cache = caches
    if cfg.fast_pred_samples and cov_cache is not None:
        # root-decomposed covariance path (reference lines 229-243): the
        # variance is the row norm of the interpolated covariance root —
        # the same root joint sampling uses, rank-capped by
        # max_root_decomposition_size inside wiski_predict_root.
        mean, root = wiski_predict_root(model, params, state, x, cfg, caches=caches)
        var = jnp.maximum(jnp.sum(root * root, axis=-1), 1e-12)
        return mean, var
    idx, w = interp_coeffs(model.grid, x, detach=cfg.detach_interp_coeff)
    mean, var = gather_predict(idx, w, mean_cache, cov_cache)
    if var is not None:
        s2 = _second_noise(model, params)
        if s2 is not None:
            var = var * s2[..., None]
        var = jnp.maximum(var, 1e-12)
    return mean, var


def wiski_predict_root(
    model: WiskiModel,
    params: Dict,
    state: WiskiState,
    x: jnp.ndarray,
    cfg: SolverConfig = DEFAULT_CONFIG,
    caches: Optional[Tuple[jnp.ndarray, Optional[jnp.ndarray]]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fast_pred_samples path: mean plus a low-rank joint-covariance root
    W_x @ root(cov_cache) for cheap posterior sampling (lines 229-243).

    The grid-space root is a Cholesky factor at m <= max_root_decomposition
    size and a rank-capped Lanczos root above it (the reference's
    ``root_decomposition(method="lanczos")`` under the same cap,
    ``batched_fixed_noise_online_gp.py:231``).

    Returns mean (B, n) and root (B, n, k) with cov ~= root @ root^T
    (k = min(m, cfg.max_root_decomposition_size)).
    """
    if caches is None:
        caches = wiski_prediction_caches(model, params, state, cfg)
    mean_cache, cov_cache = caches
    if cov_cache is None:
        raise ValueError(
            "wiski_predict_root needs the covariance cache — unset "
            "skip_posterior_variances (mean-only configs have no root)"
        )
    idx, w = interp_coeffs(model.grid, x, detach=cfg.detach_interp_coeff)
    mean = interp_matvec(idx, w, mean_cache)[..., 0]
    m = cov_cache.shape[-1]
    k = min(m, cfg.max_root_decomposition_size)
    if k < m:
        v0 = jax.random.normal(jax.random.PRNGKey(0), (m,), cov_cache.dtype)
        # vmapped over outputs: one compiled Lanczos regardless of B
        cov_root = jax.vmap(
            lambda C: lanczos_root(lambda v: C @ v, v0, k)
        )(cov_cache)  # (B, m, k)
    else:
        cov_root = psd_safe_cholesky(
            cov_cache, jitter=cfg.cholesky_jitter, tries=cfg.max_cholesky_jitter_tries
        )
    root = interp_matvec(idx, w, cov_root)  # (B, n, k)
    s2 = _second_noise(model, params)
    if s2 is not None:
        root = root * jnp.sqrt(s2)[..., None, None]
    return mean, root


def wiski_pred_cache_condition(
    model: WiskiModel,
    caches: Tuple[jnp.ndarray, jnp.ndarray],
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    detach_interp: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact O(m^2 q) conditioning of the grid-space predictive caches.

    The caches (mean_cache, cov_cache) from :func:`wiski_prediction_caches`
    parameterize the grid-space posterior N(mu, s2*C); conditioning on q
    new SKI observations y = W_x^T u + eps, eps ~ N(0, s2*noise), is plain
    Gaussian conditioning in that m-dimensional space (the learnable
    second noise s2 cancels):

        beta = diag(noise) + W^T C W            (q, q)
        mu'  = mu + C W beta^{-1} (y - W^T mu)
        C'   = C  - C W beta^{-1} (C W)^T

    This gives interleaved evaluate-then-update streaming an O(m^2) step:
    the reference (and :func:`wiski_prediction_caches`) rebuilds the
    caches from a fresh m x m Cholesky after every conditioning
    (``batched_fixed_noise_online_gp.py:369-404`` memo-dumps on update).
    Sequential conditioning equals joint conditioning, so interleaving
    predictions costs nothing extra. The caches are valid only while the
    hyperparameters are fixed — after a hyper/stem step, rebuild via
    :func:`wiski_prediction_caches` (cheap amortized over a refit cycle).
    Condition the :class:`WiskiState` alongside (``wiski_condition``) so
    MLL/refits stay consistent; periodic rebuilds also bound f32 drift.

    Args:
      caches: (mean_cache (B, m, 1), cov_cache (B, m, m)).
      x: (q, D) new inputs (stem features); y, noise: (q, B).

    Returns the conditioned (mean_cache, cov_cache).
    """
    mean_cache, cov_cache = caches
    if cov_cache is None:
        raise ValueError(
            "pred-cache conditioning needs cov_cache (built without "
            "skip_posterior_variances)"
        )
    B = model.num_outputs
    m = model.grid.num_points
    y, noise = _reshape_obs(y, noise, B)
    noise = jnp.maximum(noise, 1e-7)  # reference noise clamp (line 163)
    idx, w = interp_coeffs(model.grid, x, detach=detach_interp)
    w_cols = dense_w(idx, w, m)  # (m, q)

    with jax.default_matmul_precision("float32"):
        cw = jnp.einsum("bmk,kq->bmq", cov_cache, w_cols)  # C @ W: (B, m, q)
        beta = jnp.einsum("mq,bmr->bqr", w_cols, cw)  # (B, q, q)
        beta = beta + jax.vmap(jnp.diag, in_axes=1)(noise)  # + diag(noise_b)
        Lb = psd_safe_cholesky(beta, jitter=1e-8)
        resid = y.T[:, :, None] - jnp.einsum(
            "mq,bmk->bqk", w_cols, mean_cache
        )  # (B, q, 1)
        new_mean = mean_cache + cw @ cho_solve(Lb, resid)
        new_cov = cov_cache - cw @ cho_solve(Lb, cw.swapaxes(-1, -2))
        new_cov = 0.5 * (new_cov + new_cov.swapaxes(-1, -2))
    return new_mean, new_cov


def wiski_prequential_stream(
    model: WiskiModel,
    params: Dict,
    state: WiskiState,
    caches: Tuple[jnp.ndarray, jnp.ndarray],
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    noises: jnp.ndarray,
    detach_interp: bool = True,
    block_size: int = 128,
) -> Tuple[WiskiState, Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Interleaved evaluate-then-condition over a stream of n single points.

    Semantically the reference's prequential hot loop
    (``/root/reference/experiments/regression.py:49-54``): for each point,
    predict from the posterior conditioned on all PREVIOUS points, then
    absorb it — but blocked so the O(m^2) work lands on the MXU once per
    rank-``block_size`` chunk instead of per point (fused Pallas kernels
    for both the predictive-cache recursion,
    :mod:`online_gp_tpu.ops.pred_stream`, and the root recursion,
    :func:`online_gp_tpu.ops.root_update.roots_stream_blocked`).

    Valid only while the hyperparameters are fixed (conditioning-only
    streaming, like :func:`wiski_pred_cache_condition`); interleave hyper
    steps by breaking the stream at the hyper-step boundaries.

    Args:
      caches: (mean_cache (B, m, 1), cov_cache (B, m, m)) from
        :func:`wiski_prediction_caches`.
      xs: (n, D); ys, noises: (n, B).

    Returns (new_state, new_caches, pred_mean (B, n), pred_var (B, n));
    pred moments match :func:`wiski_predict` at the same prefix (latent f
    variance, re-scaled by the learnable second noise; observation noise
    NOT added).
    """
    mean_cache, cov_cache = caches
    if cov_cache is None:
        raise ValueError(
            "prequential streaming needs cov_cache (built without "
            "skip_posterior_variances)"
        )
    B = model.num_outputs
    n = xs.shape[0]
    y, noise = _reshape_obs(ys, noises, B)
    nz = jnp.maximum(noise, 1e-7)  # reference noise clamp (line 163)
    idx, w = interp_coeffs(model.grid, xs, detach=detach_interp)

    from online_gp_tpu.ops.pred_stream import (
        pred_stream_blocked,
        pred_stream_blocked_batched,
    )

    use_pallas = None if detach_interp else False
    if B == 1:
        new_C, new_mu, pm, pv = pred_stream_blocked(
            cov_cache[0],
            mean_cache[0, :, 0],
            idx,
            w,
            y[:, 0],
            nz[:, 0],
            block=block_size,
            use_pallas=use_pallas,
        )
        new_caches = (new_mu[None, :, None], new_C[None])
        pm, pv = pm[None], pv[None]
    else:
        new_C, new_mu, pm, pv = pred_stream_blocked_batched(
            cov_cache,
            mean_cache[..., 0],
            idx,
            w,
            y.T,
            nz.T,
            block=block_size,
            use_pallas=use_pallas,
        )
        new_caches = (new_mu[..., None], new_C)

    s2 = _second_noise(model, params)
    if s2 is not None:
        pv = pv * s2[:, None]
    pv = jnp.maximum(pv, 1e-12)

    new_state = wiski_stream(
        model, state, xs, ys, noises,
        detach_interp=detach_interp, block_size=block_size,
    )
    return new_state, new_caches, pm, pv


# ---------------------------------------------------------------------------
# fantasy batching (q-acquisition support)
# ---------------------------------------------------------------------------


def wiski_expand(state: WiskiState, num_fantasies: int) -> WiskiState:
    """Tile the caches along a new leading fantasy dim (reference
    ``get_fantasy_model`` cache expansion, lines 287-316)."""

    def tile(a):
        return jnp.broadcast_to(a[None], (num_fantasies,) + a.shape)

    return WiskiState(
        wty=tile(state.wty),
        ydy=tile(state.ydy),
        roots=root_cache_expand(state.roots, (num_fantasies,)),
        d_logdet=tile(state.d_logdet),
        num_data=tile(state.num_data),
    )


def wiski_fantasize(
    model: WiskiModel,
    state: WiskiState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
) -> WiskiState:
    """Condition F independent fantasy copies of the caches.

    Args:
      x: (F, q, D) fantasy inputs; y, noise: (F, q, B).

    Returns a state whose arrays carry a leading F dim (num_data bumps by q,
    shared across fantasies, like the reference's expanded model).

    Fantasies feed differentiable acquisitions, so the interpolation
    weights stay attached (``detach_interp=False``) — which also keeps
    this vmapped conditioning off the non-vmappable Pallas rank-1 path.
    """
    expanded = wiski_expand(state, x.shape[0])
    cond = jax.vmap(
        lambda s, xi, yi, ni: wiski_condition(
            model, s, xi, yi, ni, detach_interp=False
        )
    )
    return cond(expanded, x, y, noise)
