"""Large-grid WISKI regression wrapper (rank-capped roots).

The L5 surface (`fit/update/predict/evaluate/set_lr/.noise`) over
:mod:`online_gp_tpu.models.wiski_lowrank` — the
``max_root_decomposition_size`` + ``use_toeplitz`` regime: grids with
m ≫ max_cholesky_size (e.g. 1-D m=8192 or 3-D 40³) where the dense core's
O(m²) state is infeasible. Multi-output targets ride the batched
(``_b``) low-rank core — per-output hypers and caches over shared
inputs, mirroring the dense wrapper's batched ``WiskiModel`` (reference
``batched_fixed_noise_online_gp.py`` batches its lazies the same way).
Stems follow the dense wrapper.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.models.wiski_lowrank import (
    WiskiLowRankModel,
    lowrank_init_params_batched,
    lowrank_second_noise,
    wiski_lowrank_init,
    wiski_lowrank_init_b,
    wiski_lowrank_condition,
    wiski_lowrank_condition_b,
    wiski_lowrank_mll,
    wiski_lowrank_mll_b,
    wiski_lowrank_predict,
    wiski_lowrank_predict_b,
)
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.metrics import batched_rmse_nll


class OnlineSKILowRankRegression:
    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        lr: float = 0.01,
        grid_size: int = 4096,
        grid_bound: float = 1.0,
        rank: int = 512,
        kernel: str | Kernel = "rbf",
        use_toeplitz: bool = True,
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
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
        grid = Grid.create([(-grid_bound, grid_bound)] * stem.output_dim, grid_size)
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        self.model = WiskiLowRankModel(
            kernel, grid, rank=rank, learn_additional_noise=True, use_toeplitz=use_toeplitz
        )
        if self.target_dim == 1:
            self.params = self.model.init_params(stem.output_dim)
            self.state = wiski_lowrank_init(
                self.model, feats, init_y, jnp.ones_like(init_y), key=key,
                params=self.params,
            )
        else:
            self.params = lowrank_init_params_batched(
                self.model, stem.output_dim, self.target_dim
            )
            self.state = wiski_lowrank_init_b(
                self.model, feats, init_y, jnp.ones_like(init_y), key=key,
                params=self.params,
            )

        # streaming convention: per-step hyper moves run at lr/10 (the
        # full lr belongs to batch `fit`); together with the sigma^2 floor
        # in the model this keeps long skip-logdet streams from collapsing
        # the likelihood scale (round-1 TODO "Quality" #1).
        self.gp_opt = optax.adam(lr / 10.0)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self._jit_cache: Dict = {}

    def _features(self, x):
        feats, _ = self.stem.apply(self.stem_params, self.stem_state, x, train=False)
        return jax.lax.stop_gradient(feats)

    def _update_fn(self, q: int):
        key = ("update", q)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg = self.model, self.cfg
        cfg_skip = cfg.replace(skip_logdet_forward=True)
        gp_opt = self.gp_opt
        mll_fn = wiski_lowrank_mll if self.target_dim == 1 else wiski_lowrank_mll_b
        cond_fn = (
            wiski_lowrank_condition if self.target_dim == 1 else wiski_lowrank_condition_b
        )

        def fn(params, gp_opt_state, state, feats, y):
            loss, grads = jax.value_and_grad(
                lambda p: -jnp.sum(mll_fn(model, p, state, cfg_skip))
            )(params)
            up, gp_opt_state = gp_opt.update(grads, gp_opt_state, params)
            params = optax.apply_updates(params, up)
            noise = jnp.ones_like(y)
            # current hypers make any buffer compression kernel-aware
            # (optimal truncation of the whitened evidence operator)
            state = cond_fn(model, state, feats, y, noise, params)
            return params, gp_opt_state, state, loss

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def update(self, inputs, targets, update_stem: bool = True, update_gp: bool = True):
        if update_stem and self.stem.has_params and not getattr(self, "_warned_stem", False):
            import warnings

            self._warned_stem = True  # once per wrapper, not per update
            warnings.warn(
                "low-rank core updates are hyper+condition only: the "
                "sm_partial_mll stem objective needs the dense m x m "
                "predictive covariance cache the m x k regime never "
                "materializes — update_stem is ignored (pretrain the stem "
                "or use the dense core for online stem adaptation)",
                stacklevel=2,
            )
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        feats = self._features(inputs)
        fn = self._update_fn(inputs.shape[0])
        self.params, self.gp_opt_state, self.state, loss = fn(
            self.params, self.gp_opt_state, self.state, feats, targets
        )
        return 0.0, float(loss)

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None):
        """Hyper-only fit on the (fixed) initial caches — rebuilding a
        Lanczos root per epoch is wasteful; large-grid practice is fit
        hypers against the standing caches, then stream."""
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        feats = self._features(inputs)
        if self.target_dim == 1:
            self.state = wiski_lowrank_init(
                self.model, feats, targets, jnp.ones_like(targets), params=self.params
            )
            mll_fn = wiski_lowrank_mll
        else:
            self.state = wiski_lowrank_init_b(
                self.model, feats, targets, jnp.ones_like(targets), params=self.params
            )
            mll_fn = wiski_lowrank_mll_b
        model, cfg = self.model, self.cfg
        opt = optax.adam(self.lr)

        @jax.jit
        def epochs(params, state, opt_state):
            def step(carry, _):
                p, os_ = carry
                loss, g = jax.value_and_grad(lambda q: -jnp.sum(mll_fn(model, q, state, cfg)))(p)
                up, os_ = opt.update(g, os_, p)
                return (optax.apply_updates(p, up), os_), loss

            (p, os_), losses = jax.lax.scan(step, (params, opt_state), None, length=num_epochs)
            return p, losses

        self.params, losses = epochs(self.params, self.state, opt.init(self.params))
        records = [{"epoch": i + 1, "train_loss": float(l)} for i, l in enumerate(losses)]
        if test_dataset is not None:
            rmse, nll = self.evaluate(*test_dataset)
            records[-1].update(test_rmse=rmse, test_nll=nll)
        return records

    def predict(self, inputs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        feats = self._features(inputs)
        key = ("predict", inputs.shape[0])
        if key not in self._jit_cache:
            model, cfg = self.model, self.cfg

            if self.target_dim == 1:

                def fn(params, state, f):
                    mean, var = wiski_lowrank_predict(model, params, state, f, cfg)
                    if var is None:
                        # skip_posterior_variances: latent covariance is
                        # short-circuited to zero; observation noise remains
                        var = jnp.zeros_like(mean)
                    var = var + lowrank_second_noise(params)
                    return mean[:, None], var[:, None]

            else:

                def fn(params, state, f):
                    mean, var = wiski_lowrank_predict_b(model, params, state, f, cfg)
                    if var is None:
                        var = jnp.zeros_like(mean)
                    var = var + lowrank_second_noise(params)[:, None]
                    return mean.T, var.T  # (n, B)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](self.params, self.state, feats)

    def evaluate(self, inputs, targets) -> Tuple[float, float]:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        return batched_rmse_nll(self.predict, inputs, targets)

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        self.lr = gp_lr
        self.gp_opt = optax.adam(gp_lr / 10.0)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self._jit_cache = {}

    @property
    def noise(self):
        return lowrank_second_noise(self.params)
