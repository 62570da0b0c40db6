"""Online SKI (WISKI) streaming regression wrapper.

Stateful shell over the functional WISKI core, with the exact online
semantics of the reference's ``OnlineSKIRegression``
(``online_gp/models/online_ski_regression.py``):

- ``fit``: full-cache refit epochs — rebuild the caches from current stem
  features each epoch (gradients flow to the stem *through the
  interpolation weights*), cosine LR annealed to 1e-4 (lines 80-111),
  then a final cache freeze with detached interpolation coefficients
  (lines 107-108).
- ``update`` (the streaming hot path, lines 113-130): Sherman-Morrison
  stem step -> Woodbury-MLL hyper step with skip_logdet_forward
  (lines 132-162) -> O(m^2) conditioning on the new point -> BatchNorm
  refresh from a 1024-sample replay batch (lines 164-174).
- ``predict`` adds the learnable second noise to the variance (lines
  56-62).

TPU design: stem step + GP step + conditioning compile into ONE jitted
update function per streaming batch shape; the replay-buffer growth stays
host-side.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_mll,
    wiski_pred_cache_condition,
    wiski_predict,
    wiski_prediction_caches,
    wiski_slim,
    wiski_stream,
)
from online_gp_tpu.models.partial_mll import sm_partial_mll
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.buffers import ReplayBuffer
from online_gp_tpu.utils.metrics import batched_rmse_nll


# Above this many inducing points the dense core's three m x m f32 caches
# stop being the right regime (m=4096 is already ~200 MB of state, and init
# is O(m^3)); the flagship wrapper auto-routes to the rank-capped core.
DENSE_GRID_LIMIT = 4096


class OnlineSKIRegression:
    """Flagship streaming-regression wrapper.

    Covers BOTH WISKI regimes behind one constructor: the dense O(m^2)
    core for grids up to ``DENSE_GRID_LIMIT`` inducing points, and the
    rank-capped structured core (``OnlineSKILowRankRegression``) above it
    or whenever ``low_rank=`` is passed explicitly — the reference's
    large-grid configuration (``max_root_decomposition_size`` +
    ``use_toeplitz``, ``/root/reference/experiments/bayesopt/bayesopt.py:280-291``).
    """

    def __new__(
        cls,
        stem: Stem = None,
        init_x=None,
        init_y=None,
        lr: float = 0.01,
        grid_size: int = 30,
        grid_bound: float = 1.0,
        kernel: str | Kernel = "rbf",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        refresh_roots_every: int = 0,
        low_rank: Optional[int] = None,
        slim_state: bool = False,
        **unused,
    ):
        if cls is OnlineSKIRegression and stem is not None:
            m = grid_size ** stem.output_dim
            if low_rank is not None or m > DENSE_GRID_LIMIT:
                if slim_state or refresh_roots_every:
                    import warnings

                    warnings.warn(
                        "slim_state/refresh_roots_every are dense-core "
                        "options; the low-rank core (low_rank= / large "
                        "grids) manages its m x k roots with amortized "
                        "compression instead — ignoring them",
                        stacklevel=2,
                    )
                from online_gp_tpu.api.lowrank_regression import (
                    OnlineSKILowRankRegression,
                )

                return OnlineSKILowRankRegression(
                    stem,
                    init_x,
                    init_y,
                    lr=lr,
                    grid_size=grid_size,
                    grid_bound=grid_bound,
                    rank=low_rank or 512,
                    kernel=kernel,
                    cfg=cfg,
                    seed=seed,
                    **unused,
                )
        return super().__new__(cls)

    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        lr: float = 0.01,
        grid_size: int = 30,
        grid_bound: float = 1.0,
        kernel: str | Kernel = "rbf",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        refresh_roots_every: int = 0,
        low_rank: Optional[int] = None,
        slim_state: bool = False,
        **unused,
    ):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y)
        assert init_y.ndim == 2, "targets must have an explicit output dimension"
        self.stem = stem
        self.cfg = cfg
        self.lr = lr
        self.target_dim = init_y.shape[-1]

        key = jax.random.PRNGKey(seed)
        self.stem_params, self.stem_state = stem.init(key)
        feats, self.stem_state = stem.apply(self.stem_params, self.stem_state, init_x, train=True)
        feats = jax.lax.stop_gradient(feats)

        grid_bound = grid_bound + 1e-1
        if grid_size**stem.output_dim > DENSE_GRID_LIMIT:
            # unreachable through the factory (__new__ routes big grids to
            # the low-rank core); guards direct subclass construction
            raise ValueError(
                f"SKI grid {grid_size}^{stem.output_dim} = {grid_size**stem.output_dim} inducing "
                f"points exceeds the dense-core limit {DENSE_GRID_LIMIT}; pass low_rank= "
                "(or construct via OnlineSKIRegression, which auto-routes)"
            )
        grid = Grid.create([(-grid_bound, grid_bound)] * stem.output_dim, grid_size)
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        self.model = WiskiModel(
            kernel, grid, num_outputs=self.target_dim, learn_additional_noise=True
        )
        self.params = self.model.init_params(stem.output_dim)
        if hasattr(kernel, "data_init_params"):
            # init-sensitive kernels (spectral mixture) take their starting
            # hypers from the init data, like gpytorch's initialize_from_data
            self.params["kernel"] = kernel.data_init_params(
                feats, init_y, jax.random.fold_in(key, 1), (self.target_dim,)
            )
        # slim_state drops the Gram accumulator from the streaming state
        # (4 m^2 instead of 6 m^2 HBM floats per online update); periodic
        # refreshes then re-anchor to L L^T (see wiski_slim docstring).
        self.slim_state = slim_state
        if slim_state:
            self._init_fn = jax.jit(
                lambda f, t, n: wiski_slim(wiski_init(self.model, f, t, n))
            )
        else:
            self._init_fn = jax.jit(lambda f, t, n: wiski_init(self.model, f, t, n))
        noise = jnp.ones_like(init_y)
        self.state = self._init_fn(feats, init_y, noise)

        self.gp_opt = optax.adam(lr)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self.stem_opt = optax.adam(lr)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self.buffer = ReplayBuffer(np.asarray(init_x))
        self._train_data = (np.asarray(init_x), np.asarray(init_y))
        self.refresh_roots_every = refresh_roots_every
        self._updates_since_refresh = 0
        self._jit_cache: Dict = {}
        # grid-space predictive caches (mean, cov): built lazily on the
        # first predict, reused across predicts, conditioned in O(m^2) on
        # hyper-free updates, invalidated whenever params/stem/state move
        # under them. The reference rebuilds these O(m^3) caches after
        # every update (its memo cache is dumped by condition/zero_grad).
        self._pred_caches = None

    # -- jitted building blocks -------------------------------------------

    def _update_fn(self, q: int, update_stem: bool = True, update_gp: bool = True):
        """One fused streaming update for a batch of q points."""
        key = ("update", q, update_stem, update_gp)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, stem = self.model, self.cfg, self.stem
        cfg_skip = cfg.replace(skip_logdet_forward=True)
        gp_opt, stem_opt = self.gp_opt, self.stem_opt

        def fn(params, stem_params, bn_state, gp_opt_state, stem_opt_state, state, x, y):
            # 1) stem step on the Sherman-Morrison partial MLL
            def stem_loss(sp):
                feats, _ = stem.apply(sp, bn_state, x, train=False)
                return -jnp.sum(sm_partial_mll(model, params, state, feats, y, cfg))

            if stem.has_params and update_stem:
                s_loss, s_grads = jax.value_and_grad(stem_loss)(stem_params)
                s_updates, stem_opt_state = stem_opt.update(s_grads, stem_opt_state, stem_params)
                stem_params = optax.apply_updates(stem_params, s_updates)
            else:
                s_loss = jnp.asarray(0.0)

            # 2) GP hyper step on the Woodbury MLL (skip_logdet_forward).
            # In the iterative (m > max_cholesky_size) regime the SLQ/
            # Hutchinson probes are re-drawn per update (keyed on the
            # stream position) so the logdet gradient averages over probe
            # realizations instead of chasing one fixed draw.
            def gp_loss_fn(p):
                slq_key = jax.random.fold_in(
                    jax.random.PRNGKey(7), state.num_data.astype(jnp.uint32)
                )
                return -jnp.sum(wiski_mll(model, p, state, cfg_skip, slq_key=slq_key))

            if update_gp:
                g_loss, g_grads = jax.value_and_grad(gp_loss_fn)(params)
                g_updates, gp_opt_state = gp_opt.update(g_grads, gp_opt_state, params)
                params = optax.apply_updates(params, g_updates)
            else:
                g_loss = jnp.asarray(0.0)

            # 3) condition the caches on the new observations
            feats, _ = stem.apply(stem_params, bn_state, x, train=False)
            feats = jax.lax.stop_gradient(feats)
            noise = jnp.ones_like(y)
            state = wiski_condition(model, state, feats, y, noise)
            return params, stem_params, gp_opt_state, stem_opt_state, state, s_loss, g_loss

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _predict_fn(self, n: int):
        key = ("predict", n)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, stem = self.model, self.cfg, self.stem
        cfg_eval = cfg.replace(detach_interp_coeff=True)

        def fn(params, stem_params, bn_state, state, caches, x):
            feats, _ = stem.apply(stem_params, bn_state, x, train=False)
            mean, var = wiski_predict(model, params, state, feats, cfg_eval, caches=caches)
            s2 = jnp.exp(params["raw_second_noise"])
            if var is None:
                # skip_posterior_variances: reference short-circuits the
                # latent covariance to zero; the observation noise remains
                var = jnp.zeros_like(mean)
            var = var + s2[:, None]
            return mean.T, var.T  # (n, T)

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _ensure_pred_caches(self):
        """Build (or reuse) the grid-space predictive caches."""
        if self._pred_caches is None:
            key = "pred_caches"
            if key not in self._jit_cache:
                model, cfg = self.model, self.cfg
                cfg_eval = cfg.replace(detach_interp_coeff=True)
                self._jit_cache[key] = jax.jit(
                    lambda params, state: wiski_prediction_caches(
                        model, params, state, cfg_eval
                    )
                )
            self._pred_caches = self._jit_cache[key](self.params, self.state)
        return self._pred_caches

    def _pc_condition_fn(self, q: int):
        """O(m^2 q) incremental conditioning of the predictive caches."""
        key = ("pc_cond", q)
        if key not in self._jit_cache:
            model, stem = self.model, self.stem

            def fn(stem_params, bn_state, caches, x, y):
                feats, _ = stem.apply(stem_params, bn_state, x, train=False)
                feats = jax.lax.stop_gradient(feats)
                return wiski_pred_cache_condition(
                    model, caches, feats, y, jnp.ones_like(y)
                )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def _bn_refresh_fn(self, q: int):
        key = ("bn", q)
        if key in self._jit_cache:
            return self._jit_cache[key]
        stem = self.stem

        def fn(stem_params, bn_state, x):
            _, new_state = stem.apply(stem_params, bn_state, x, train=True)
            return new_state

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # -- public API --------------------------------------------------------

    def predict(self, inputs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        caches = self._ensure_pred_caches()
        fn = self._predict_fn(inputs.shape[0])
        return fn(self.params, self.stem_params, self.stem_state, self.state, caches, inputs)

    def evaluate(self, inputs, targets) -> Tuple[float, float]:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        return batched_rmse_nll(self.predict, inputs, targets)

    def update(self, inputs, targets, update_stem: bool = True, update_gp: bool = True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        if inputs.shape[0] == 0:
            raise ValueError("update() called with an empty batch")
        fn = self._update_fn(inputs.shape[0], update_stem, update_gp)
        (
            self.params,
            self.stem_params,
            self.gp_opt_state,
            self.stem_opt_state,
            self.state,
            s_loss,
            g_loss,
        ) = fn(
            self.params,
            self.stem_params,
            self.stem_state,
            self.gp_opt_state,
            self.stem_opt_state,
            self.state,
            inputs,
            targets,
        )
        hyper_moved = update_gp or (update_stem and self.stem.has_params)
        if hyper_moved or (
            self._pred_caches is not None and self._pred_caches[1] is None
        ):
            # hyper movement invalidates; mean-only caches
            # (skip_posterior_variances) cannot be conditioned in place
            self._pred_caches = None
        elif self._pred_caches is not None:
            # conditioning-only update: O(m^2) exact rank-q conditioning of
            # the predictive caches instead of an O(m^3) rebuild at the
            # next predict
            self._pred_caches = self._pc_condition_fn(inputs.shape[0])(
                self.stem_params, self.stem_state, self._pred_caches, inputs, targets
            )
        self.buffer.append(np.asarray(inputs))
        self._updates_since_refresh += 1
        if self.refresh_roots_every and self._updates_since_refresh >= self.refresh_roots_every:
            from online_gp_tpu.models.wiski import wiski_refresh_roots

            self.state = wiski_refresh_roots(self.state)
            self._updates_since_refresh = 0
        if update_stem and self.stem.has_params:
            # refresh BatchNorm running stats on new + replayed inputs
            replay = jnp.asarray(self.buffer.sample(1024))
            batch = jnp.concatenate([inputs, replay])
            self.stem_state = self._bn_refresh_fn(inputs.shape[0])(
                self.stem_params, self.stem_state, batch
            )
        return float(s_loss), float(g_loss)

    def hyper_step(self, inputs, targets, update_stem: bool = True, update_gp: bool = True):
        """One stem + GP hyperparameter step WITHOUT conditioning.

        The fused-stream driver mode (``experiments/regression.py
        stream_mode=fused``) absorbs observations through
        :meth:`prequential` and runs the hyper/stem steps only at segment
        boundaries — this is that boundary step. Same objectives as the
        per-point :meth:`update` (Sherman-Morrison partial MLL for the
        stem, Woodbury MLL with skip_logdet_forward for the GP; reference
        ``online_ski_regression.py:132-162``), applied to the already-
        absorbed caches; ``inputs/targets`` feed only the stem objective.

        Returns (stem_loss, gp_loss) like :meth:`update`.
        """
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        key = ("hyper", inputs.shape[0], update_stem, update_gp)
        if key not in self._jit_cache:
            model, cfg, stem = self.model, self.cfg, self.stem
            cfg_skip = cfg.replace(skip_logdet_forward=True)
            gp_opt, stem_opt = self.gp_opt, self.stem_opt

            def fn(params, stem_params, bn_state, gp_opt_state, stem_opt_state, state, x, y):
                def stem_loss(sp):
                    feats, _ = stem.apply(sp, bn_state, x, train=False)
                    return -jnp.sum(sm_partial_mll(model, params, state, feats, y, cfg))

                if stem.has_params and update_stem:
                    s_loss, s_grads = jax.value_and_grad(stem_loss)(stem_params)
                    s_updates, stem_opt_state = stem_opt.update(s_grads, stem_opt_state, stem_params)
                    stem_params = optax.apply_updates(stem_params, s_updates)
                else:
                    s_loss = jnp.asarray(0.0)

                def gp_loss_fn(p):
                    slq_key = jax.random.fold_in(
                        jax.random.PRNGKey(7), state.num_data.astype(jnp.uint32)
                    )
                    return -jnp.sum(wiski_mll(model, p, state, cfg_skip, slq_key=slq_key))

                if update_gp:
                    g_loss, g_grads = jax.value_and_grad(gp_loss_fn)(params)
                    g_updates, gp_opt_state = gp_opt.update(g_grads, gp_opt_state, params)
                    params = optax.apply_updates(params, g_updates)
                else:
                    g_loss = jnp.asarray(0.0)
                return params, stem_params, gp_opt_state, stem_opt_state, s_loss, g_loss

            self._jit_cache[key] = jax.jit(fn)
        (
            self.params,
            self.stem_params,
            self.gp_opt_state,
            self.stem_opt_state,
            s_loss,
            g_loss,
        ) = self._jit_cache[key](
            self.params, self.stem_params, self.stem_state,
            self.gp_opt_state, self.stem_opt_state, self.state, inputs, targets,
        )
        if update_gp or (update_stem and self.stem.has_params):
            self._pred_caches = None  # hypers moved under the caches
        if update_stem and self.stem.has_params:
            replay = jnp.asarray(self.buffer.sample(1024))
            batch = jnp.concatenate([inputs, replay])
            self.stem_state = self._bn_refresh_fn(inputs.shape[0])(
                self.stem_params, self.stem_state, batch
            )
        return float(s_loss), float(g_loss)

    def prequential(self, inputs, targets):
        """Interleaved evaluate-then-update over a stream (conditioning
        only — no hyper/stem steps): for each point, predict from the
        posterior conditioned on all previous points, then absorb it.

        This is the reference's prequential hot loop
        (``experiments/regression.py:49-54``) run through the blocked
        recursions (:func:`wiski_prequential_stream`): per-point exactness
        with O(m^2)/chunk instead of O(m^2)/point cost.

        Returns (mean, var) of shape (n, T) — predictive y-moments with
        the learnable second noise added, matching :meth:`predict`.
        """
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        caches = self._ensure_pred_caches()
        if caches[1] is None:
            raise ValueError(
                "prequential streaming needs posterior variances — unset "
                "cfg.skip_posterior_variances"
            )
        key = ("prequential", inputs.shape[0])
        if key not in self._jit_cache:
            model, stem = self.model, self.stem
            from online_gp_tpu.models.wiski import wiski_prequential_stream

            def fn(params, stem_params, bn_state, state, caches, x, y):
                feats, _ = stem.apply(stem_params, bn_state, x, train=False)
                feats = jax.lax.stop_gradient(feats)
                state, caches, pm, pv = wiski_prequential_stream(
                    model, params, state, caches, feats, y, jnp.ones_like(y)
                )
                s2 = jnp.exp(params["raw_second_noise"])
                return state, caches, pm.T, (pv + s2[:, None]).T  # (n, T)

            self._jit_cache[key] = jax.jit(fn)
        self.state, self._pred_caches, mean, var = self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.state,
            caches, inputs, targets,
        )
        self.buffer.append(np.asarray(inputs))
        self._updates_since_refresh += inputs.shape[0]
        if self.refresh_roots_every and self._updates_since_refresh >= self.refresh_roots_every:
            from online_gp_tpu.models.wiski import wiski_refresh_roots

            self.state = wiski_refresh_roots(self.state)
            self._updates_since_refresh = 0
        return mean, var

    def absorb(self, inputs, targets):
        """Bulk-absorb a stream of observations (conditioning only — no
        hyper/stem steps): one exact rank-1 update per point through
        :func:`wiski_stream`'s blocked-product recursion (fused Pallas
        chunk kernel; ~744k updates/s at a 30^2 grid on one chip)."""
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        key = ("absorb", inputs.shape[0])
        if key not in self._jit_cache:
            model, stem = self.model, self.stem

            def fn(params, stem_params, bn_state, state, x, y):
                feats, _ = stem.apply(stem_params, bn_state, x, train=False)
                feats = jax.lax.stop_gradient(feats)
                return wiski_stream(model, state, feats, y, jnp.ones_like(y))

            self._jit_cache[key] = jax.jit(fn)
        self.state = self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.state, inputs, targets
        )
        self._pred_caches = None
        self.buffer.append(np.asarray(inputs))
        # the drift-control policy counts absorbed points like updates
        self._updates_since_refresh += inputs.shape[0]
        if self.refresh_roots_every and self._updates_since_refresh >= self.refresh_roots_every:
            from online_gp_tpu.models.wiski import wiski_refresh_roots

            self.state = wiski_refresh_roots(self.state)
            self._updates_since_refresh = 0
        return self.state

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        self._train_data = (np.asarray(inputs), np.asarray(targets))
        model, cfg, stem = self.model, self.cfg, self.stem
        noise = jnp.ones_like(targets)

        sched = optax.cosine_decay_schedule(self.lr, max(num_epochs, 1), alpha=1e-4 / self.lr)
        gp_opt = optax.adam(sched)
        stem_opt = optax.adam(sched)
        gp_os = gp_opt.init(self.params)
        stem_os = stem_opt.init(self.stem_params)

        @jax.jit
        def epoch_step(params, stem_params, bn_state, gp_os, stem_os, slq_key):
            def loss_fn(p, sp):
                feats, new_bn = stem.apply(sp, bn_state, inputs, train=True)
                st = wiski_init(model, feats, targets, noise)
                return -jnp.sum(wiski_mll(model, p, st, cfg, slq_key=slq_key)), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, stem_params
            )
            g_up, gp_os = gp_opt.update(grads[0], gp_os, params)
            params = optax.apply_updates(params, g_up)
            if stem.has_params:
                s_up, stem_os = stem_opt.update(grads[1], stem_os, stem_params)
                stem_params = optax.apply_updates(stem_params, s_up)
            return params, stem_params, new_bn, gp_os, stem_os, loss

        records = []
        for epoch in range(num_epochs):
            (
                self.params,
                self.stem_params,
                self.stem_state,
                gp_os,
                stem_os,
                loss,
            ) = epoch_step(
                self.params,
                self.stem_params,
                self.stem_state,
                gp_os,
                stem_os,
                jax.random.fold_in(jax.random.PRNGKey(11), epoch),
            )
            rmse = nll = float("nan")
            if test_dataset is not None:
                # refresh caches at current hypers/features before eval
                self._refresh_state(inputs, targets)
                test_x, test_y = test_dataset
                rmse, nll = self.evaluate(test_x, test_y)
            records.append(
                {
                    "epoch": epoch + 1,
                    "train_loss": float(loss),
                    "test_rmse": rmse,
                    "test_nll": nll,
                    "noise": float(jnp.exp(self.params["raw_second_noise"]).mean()),
                }
            )

        # final cache freeze with detached interpolation coefficients
        self._refresh_state(inputs, targets)
        return records

    def _refresh_state(self, inputs, targets):
        feats, _ = self.stem.apply(self.stem_params, self.stem_state, inputs, train=False)
        feats = jax.lax.stop_gradient(feats)
        self.state = self._init_fn(feats, targets, jnp.ones_like(targets))
        self._pred_caches = None

    def set_train_data(self, inputs, targets):
        self._refresh_state(
            jnp.asarray(inputs).reshape(-1, self.stem.input_dim),
            jnp.asarray(targets).reshape(-1, self.target_dim),
        )

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        stem_lr = gp_lr if stem_lr is None else stem_lr
        self.gp_opt = optax.adam(gp_lr)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self.stem_opt = optax.adam(stem_lr)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        if bn_mom is not None and "bn" in self.stem_state:
            self.stem_state = dict(self.stem_state)
            self.stem_state["bn"] = dict(self.stem_state["bn"], momentum=jnp.asarray(bn_mom))
        self._jit_cache = {}

    @property
    def noise(self):
        return jnp.exp(self.params["raw_second_noise"])

    def mll_value(self) -> float:
        return float(jnp.sum(wiski_mll(self.model, self.params, self.state, self.cfg)))
