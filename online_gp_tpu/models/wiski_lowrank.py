"""Large-grid WISKI: rank-capped roots + structured K_uu MVMs.

The dense WISKI core (``models/wiski.py``) stores m×m roots — O(m²) state,
O(m³) init — which caps the inducing grid around m ≲ 2-4k. The reference's
large-grid regime is gpytorch's Lanczos root decomposition capped at
``max_root_decomposition_size`` (512) plus Toeplitz grid kernels under
``use_toeplitz`` (reference ``config/regression.yaml:24-27``,
``experiments/bayesopt/bayesopt.py:280-291``): roots become m×k with
k ≪ m, updates stay within the tracked column space, and every solve is
k×k. This module is that regime, TPU-first:

  state:  root L (m, k_buf) with ``used`` active columns; wty, ydy,
          d_logdet as in the dense core.
  update: EXACT rank-1 append — A + v v^T = [L v][L v]^T — into the spare
          buffer columns, with an amortized top-k SVD compression when the
          buffer fills (O(m k^2) every k_buf - k updates). Strictly more
          accurate than the reference's fixed-subspace rank-capped update,
          which silently drops the out-of-span component
          (``updated_root_lazy_tensor.py:99-108``).
  mll:    Q = I_k + L^T K_uu L via k structured MVMs (Kronecker or
          Toeplitz-FFT factors — never a dense K_uu), then a k×k Cholesky:

    quad   = y'D^{-1}y - wty' K wty + proj' Q^{-1} proj,
    logdet = log|Q| + log|D|,   proj = L^T K wty

  predict: mean cache = K wty - (K L) Q^{-1} L' K wty  (m-vector),
           variance via the LOVE-style rank-k root R = (K L) Lq^{-T} and
           per-point Toeplitz diagonals.

Init absorbs the seed data through the same exact append-then-compress
recursion (chunks of the exact factor V = W^T D^{-1/2}), so the root is
exact up to the buffer width and optimally truncated beyond it — see
``wiski_lowrank_init``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import Kernel
from online_gp_tpu.kernels.grid_kernel import grid_kuu_mvm
from online_gp_tpu.kernels.priors import log_prior_sum
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.ops.interp import interp_coeffs, dense_w, interp_matvec
from online_gp_tpu.ops.chol import psd_safe_cholesky, cho_solve, chol_logdet, tri_solve

LOG_2PI = 1.8378770664093453


class WiskiLowRankModel(NamedTuple):
    kernel: Kernel
    grid: Grid
    rank: int = 512  # compression target (the reference's max_root_decomposition_size)
    buffer_cols: int = 0  # root buffer width; 0 -> 2*rank
    learn_additional_noise: bool = False
    use_toeplitz: bool = True
    priors: Optional[tuple] = None

    @property
    def k_buf(self) -> int:
        return self.buffer_cols or 2 * self.rank

    def init_params(self, num_dims: int, dtype=jnp.float32, **kw) -> Dict:
        params = {"kernel": self.kernel.init_params(num_dims, (), dtype=dtype, **kw)}
        if self.learn_additional_noise:
            params["raw_second_noise"] = jnp.zeros((), dtype)
        return params


class WiskiLowRankState(NamedTuple):
    wty: jnp.ndarray  # (m, 1)
    ydy: jnp.ndarray  # ()
    root: jnp.ndarray  # (m, k_buf); columns >= used are zero
    used: jnp.ndarray  # () int32 — active root columns
    d_logdet: jnp.ndarray  # ()
    num_data: jnp.ndarray  # () int32


# Floor on the learnable second noise. Per-step skip-logdet hyper fitting
# can collapse sigma^2 toward zero over long streams (fine for RMSE,
# catastrophic for NLL — round-1 TODO "Quality" #1); the floor keeps the
# likelihood scale sane while leaving the gradient alive above it.
S2_FLOOR = 1e-4


def lowrank_second_noise(params: Dict) -> Optional[jnp.ndarray]:
    """Floored multiplicative second noise sigma^2 = S2_FLOOR + exp(raw)."""
    raw = params.get("raw_second_noise")
    if raw is None:
        return None
    return S2_FLOOR + jnp.exp(raw)


def _kuu_mvm(model: WiskiLowRankModel, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """(m, k) -> (m, k) structured K_uu product (never dense)."""
    kuu = grid_kuu_mvm(model.kernel, params["kernel"], model.grid, x, model.use_toeplitz)
    s2 = lowrank_second_noise(params)
    if s2 is not None:
        kuu = kuu / s2
    return kuu


def wiski_lowrank_init(
    model: WiskiLowRankModel,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    key=None,
    chunk: int = 4096,
    params: Optional[Dict] = None,
) -> WiskiLowRankState:
    """Build caches by absorbing the seed data through the EXACT
    append-then-compress recursion the streaming path uses.

    The root starts empty and each ≤(k_buf - rank)-column chunk of the
    exact factor V = W^T D^{-1/2} is appended via
    :func:`wiski_lowrank_condition`; compression (optimal top-``rank``
    SVD truncation of the accumulated root) only fires once the buffer
    fills. Consequences:

    - n ≤ k_buf (= 2·rank by default): the root is EXACT — the collapsed
      MLL and the posterior mean see the full data evidence.
    - n > k_buf: the root is the same amortized top-k truncation a
      streamed ingest would produce — never worse than streaming.

    An earlier design took a fixed rank-``rank`` Lanczos root of
    A = W D^{-1} W^T here. That under-shrinks whenever n > rank: ``wty``
    is exact over all n points while the Woodbury correction only spans
    the probed rank-k subspace, so posterior means grow ~O(n) in the
    unshrunk directions and hyper fits on the truncated MLL diverge (the
    reference never hits this because its mean-path solves are CG, with
    the capped root only used for LOVE variances —
    ``updated_root_lazy_tensor.py``; here the rank-capped root IS the
    inverse, so init must respect the buffer contract).

    ``key`` is accepted for API compatibility; the recursion is
    deterministic and ignores it. With ``params``, any compression the
    seed absorb triggers (n > k_buf) is kernel-aware — see
    :func:`wiski_lowrank_condition`.
    """
    del key  # deterministic init — kept for call-site compatibility
    if model.k_buf <= model.rank:
        raise ValueError(
            f"buffer_cols ({model.k_buf}) must exceed rank ({model.rank}): "
            "the buffer needs headroom past the compression target to "
            "absorb data (a zero/negative absorb step would silently "
            "ingest nothing)"
        )
    m = model.grid.num_points
    y = y.reshape(-1, 1)
    noise = noise.reshape(-1, 1)
    n = x.shape[0]
    dtype = x.dtype

    state = WiskiLowRankState(
        wty=jnp.zeros((m, 1), dtype),
        ydy=jnp.zeros((), dtype),
        root=jnp.zeros((m, model.k_buf), dtype),
        used=jnp.asarray(0, jnp.int32),
        d_logdet=jnp.zeros((), dtype),
        num_data=jnp.asarray(0, jnp.int32),
    )
    # one traced absorb per chunk shape (two compiles: body + tail)
    absorb = jax.jit(
        lambda s, xc, yc, nc: wiski_lowrank_condition(model, s, xc, yc, nc, params)
    )
    step = min(chunk, model.k_buf - model.rank)
    for start in range(0, n, step):
        state = absorb(
            state,
            x[start : start + step],
            y[start : start + step],
            noise[start : start + step],
        )
    return state


def wiski_lowrank_condition(
    model: WiskiLowRankModel,
    state: WiskiLowRankState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    noise: jnp.ndarray,
    params: Optional[Dict] = None,
) -> WiskiLowRankState:
    """Exact O(m q) rank-q conditioning by column append, with amortized
    top-rank compression.

    A + v v^T = [L v][L v]^T exactly, so new observations append scaled
    interpolation columns into the root buffer. When fewer than q slots
    remain, the root is compressed to its best rank-``model.rank``
    approximation first (eigh of a k_buf x k_buf Gram, O(m k^2) once per
    ~(k_buf - rank) updates). The compression is the ONLY approximation —
    unlike the reference's fixed-subspace update, no out-of-span
    information is dropped at append time.

    With ``params`` (kernel hypers), compression is KERNEL-AWARE: the
    eigh runs on L^T K_uu L (k_buf structured MVMs) instead of L^T L, so
    the retained subspace is the optimal rank-``rank`` truncation of the
    whitened evidence operator K^{1/2} A K^{1/2} — the object whose
    truncation error drives posterior-mean error — rather than of A
    itself. Directions with little posterior shrinkage are dropped first.
    The state then depends (through the truncation choice only) on the
    hypers at compression time; conditioning stays gradient-free either
    way. Without ``params`` the Frobenius-optimal A-truncation is used.
    """
    y = y.reshape(-1, 1)
    noise = noise.reshape(-1, 1)
    q = x.shape[0]
    m = model.grid.num_points
    k_buf, k0 = model.k_buf, model.rank
    if q > k_buf - k0:
        raise ValueError(f"batch q={q} exceeds buffer headroom {k_buf - k0}")

    idx, w = interp_coeffs(model.grid, x, detach=True)
    w_cols = dense_w(idx, w, m)  # (m, q)
    v = w_cols / jnp.sqrt(jnp.maximum(noise[:, 0], 1e-7))[None, :]

    with jax.default_matmul_precision("float32"):
        def compress(root):
            if params is None:
                gram = root.T @ root  # (k_buf, k_buf)
            else:
                # right-singular vectors of K^{1/2} L: B V_k V_k^T B^T is
                # the best rank-k approx of B B^T for B = K^{1/2} L
                kroot = jax.lax.stop_gradient(
                    _kuu_mvm(model, params, root)
                )  # (m, k_buf)
                gram = root.T @ kroot
                gram = 0.5 * (gram + gram.T)
            evals, V = jnp.linalg.eigh(gram)  # ascending
            keep = V[:, k_buf - k0 :]  # top-k0 eigvecs
            newL = root @ keep  # (m, k0); newL newL^T = best rank-k0 approx
            return jnp.zeros_like(root).at[:, :k0].set(newL)

        need_compress = state.used + q > k_buf
        root = jax.lax.cond(need_compress, compress, lambda r: r, state.root)
        used = jnp.where(need_compress, k0, state.used)
        root = _append_cols(root, v, used)
        used = used + q

        dinv_y = y / noise
        new_wty = state.wty.at[idx.reshape(-1), 0].add((w * dinv_y).reshape(-1))

    return WiskiLowRankState(
        wty=new_wty,
        ydy=state.ydy + jnp.sum(y * dinv_y),
        root=root,
        used=used,
        d_logdet=state.d_logdet + jnp.sum(jnp.log(noise)),
        num_data=state.num_data + q,
    )


def _append_cols(root: jnp.ndarray, v: jnp.ndarray, used) -> jnp.ndarray:
    """Write v's q columns at positions [used, used+q) (traced index)."""
    k_buf = root.shape[-1]
    q = v.shape[-1]
    col_ids = jnp.arange(k_buf)
    mask = (col_ids >= used) & (col_ids < used + q)  # (k_buf,)
    src = jnp.zeros_like(root)
    # place v columns at the right offsets: column j of v -> slot used + j
    offsets = jnp.clip(col_ids - used, 0, q - 1)
    gathered = v[:, offsets]  # (m, k_buf)
    return jnp.where(mask[None, :], gathered, root)


def _q_pieces(model, params, state):
    L = state.root  # (m, k)
    k = L.shape[-1]
    with jax.default_matmul_precision("float32"):
        KuuL = _kuu_mvm(model, params, L)  # (m, k) structured MVMs
        Q = jnp.eye(k, dtype=L.dtype) + L.T @ KuuL
        Q = 0.5 * (Q + Q.T)
        Lq = psd_safe_cholesky(Q, jitter=1e-6)
        Kuu_wty = _kuu_mvm(model, params, state.wty)  # (m, 1)
        proj = L.T @ Kuu_wty  # (k, 1)
    return KuuL, Lq, Kuu_wty, proj


def wiski_lowrank_mll(
    model: WiskiLowRankModel,
    params: Dict,
    state: WiskiLowRankState,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Woodbury MLL with k×k solves and structured K_uu MVMs."""
    _, Lq, Kuu_wty, proj = _q_pieces(model, params, state)
    with jax.default_matmul_precision("float32"):
        sol = cho_solve(Lq, proj)
        inner_qform = jnp.sum(proj * sol)
        inner_logdet = chol_logdet(Lq)
        if cfg.skip_logdet_forward:
            inner_logdet = inner_logdet - jax.lax.stop_gradient(inner_logdet)
        inducing_qform = jnp.sum(state.wty * Kuu_wty)
        quad = state.ydy - inducing_qform + inner_qform
        logdet = inner_logdet + state.d_logdet
        n = state.num_data.astype(quad.dtype)
        final = n * LOG_2PI
        s2 = lowrank_second_noise(params)
        if s2 is not None:
            quad = quad / s2
            final = final + n * jnp.log(s2)
        res = -0.5 * (quad + logdet + final)
        if model.priors:
            res = res + log_prior_sum(
                dict(model.priors), params["kernel"], model.kernel.transforms
            )
        return res / n


def wiski_lowrank_predict(
    model: WiskiLowRankModel,
    params: Dict,
    state: WiskiLowRankState,
    x: jnp.ndarray,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean/variance with O(m k) caches.

    mean cache: K wty - (K L) Q^{-1} proj            (m, 1)
    LOVE root:  R = (K L) Lq^{-T}                    (m, k)
    var(x)   =  k(x,x) / s2? ... = w_x' K w_x - |R' w_x|^2  (prior diag via
               the stationary kernel; cross term through one more MVM).
    """
    KuuL, Lq, Kuu_wty, proj = _q_pieces(model, params, state)
    with jax.default_matmul_precision("float32"):
        mean_cache = Kuu_wty - KuuL @ cho_solve(Lq, proj)  # (m, 1)
        R = tri_solve(Lq, KuuL.T).T  # (m, k): KuuL Lq^{-T}

        idx, w = interp_coeffs(model.grid, x, detach=cfg.detach_interp_coeff)
        mean = interp_matvec(idx, w, mean_cache)[:, 0]  # (n,)
        if cfg.skip_posterior_variances:
            return mean, None
        # prior term w_x' K_uu w_x: one structured MVM per query batch
        Wx = dense_w(idx, w, model.grid.num_points)  # (m, n)
        KWx = _kuu_mvm(model, params, Wx)  # (m, n)
        prior_diag = jnp.sum(Wx * KWx, axis=0)  # (n,)
        Rw = interp_matvec(idx, w, R)  # (n, k)
        var = prior_diag - jnp.sum(Rw * Rw, axis=-1)
        s2 = lowrank_second_noise(params)
        if s2 is not None:
            var = var * s2
        return mean, jnp.maximum(var, 1e-12)


# ---------------------------------------------------------------------------
# batched (multi-output) variants
# ---------------------------------------------------------------------------
#
# The single-output core above is a set of pure functions, so multi-output
# (e.g. a Dirichlet classifier's per-class regressions at grids past the
# dense O(m^2) regime) is plain jax.vmap over a leading output axis:
# per-output kernel hypers + second noise, per-output caches, SHARED
# inputs. This closes the dense-vs-lowrank capability asymmetry at the
# model layer (the dense WiskiModel is natively batched over outputs;
# reference ``batched_fixed_noise_online_gp.py`` likewise batches its
# lazies).
#
# Recipe (same as the L5 wrapper, ``api/lowrank_regression.py``): pass
# UNIT fixed noise and let the learnable sigma^2 carry the observation
# scale, keep ``rank`` at or above the data absorbed per compression
# cycle, and fit hypers at moderate rates — the rank-k root makes the
# MLL an approximation that hot optimizers can exploit into degenerate
# hypers (the reference's Lanczos ``inv_quad_logdet`` regime shares this
# property).


def lowrank_init_params_batched(
    model: WiskiLowRankModel, num_dims: int, num_outputs: int,
    dtype=jnp.float32, **kw,
) -> Dict:
    """Per-output kernel hypers ((B, ...) leaves) + (B,) second noise."""
    params = {"kernel": model.kernel.init_params(num_dims, (num_outputs,), dtype=dtype, **kw)}
    if model.learn_additional_noise:
        params["raw_second_noise"] = jnp.zeros((num_outputs,), dtype)
    return params


def wiski_lowrank_init_b(
    model: WiskiLowRankModel, x: jnp.ndarray, y: jnp.ndarray,
    noise: jnp.ndarray, key=None, chunk: int = 4096,
    params: Optional[Dict] = None,
) -> WiskiLowRankState:
    """Batched init: shared x (n, d); y/noise (n, B). State leaves gain a
    leading B dim. With ``params`` (per-output batched hypers), any seed
    compression is kernel-aware per output."""
    B = y.shape[-1]
    key = jax.random.PRNGKey(0) if key is None else key
    keys = jax.random.split(key, B)
    if params is None:
        return jax.vmap(
            lambda yy, nn, kk: wiski_lowrank_init(model, x, yy, nn, key=kk, chunk=chunk)
        )(y.T, noise.T, keys)
    return jax.vmap(
        lambda yy, nn, kk, p: wiski_lowrank_init(
            model, x, yy, nn, key=kk, chunk=chunk, params=p
        )
    )(y.T, noise.T, keys, params)


def wiski_lowrank_condition_b(
    model: WiskiLowRankModel, state: WiskiLowRankState, x: jnp.ndarray,
    y: jnp.ndarray, noise: jnp.ndarray, params: Optional[Dict] = None,
) -> WiskiLowRankState:
    """Batched rank-q conditioning: shared x (q, d); y/noise (q, B).
    With ``params`` (per-output batched hypers), compression is
    kernel-aware per output — see :func:`wiski_lowrank_condition`."""
    if params is None:
        return jax.vmap(
            lambda s, yy, nn: wiski_lowrank_condition(model, s, x, yy, nn)
        )(state, y.T, noise.T)
    return jax.vmap(
        lambda s, yy, nn, p: wiski_lowrank_condition(model, s, x, yy, nn, p)
    )(state, y.T, noise.T, params)


def wiski_lowrank_mll_b(
    model: WiskiLowRankModel, params: Dict, state: WiskiLowRankState,
    cfg: SolverConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """(B,) per-output MLLs — callers sum, like dense ``wiski_mll``."""
    return jax.vmap(lambda p, s: wiski_lowrank_mll(model, p, s, cfg))(params, state)


def wiski_lowrank_predict_b(
    model: WiskiLowRankModel, params: Dict, state: WiskiLowRankState,
    x: jnp.ndarray, cfg: SolverConfig = DEFAULT_CONFIG,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(B, n) posterior means/vars at shared query points."""
    if cfg.skip_posterior_variances:
        mean = jax.vmap(lambda p, s: wiski_lowrank_predict(model, p, s, x, cfg)[0])(params, state)
        return mean, None
    return jax.vmap(lambda p, s: wiski_lowrank_predict(model, p, s, x, cfg))(params, state)
