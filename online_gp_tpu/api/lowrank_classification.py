"""Low-rank (large-grid) Dirichlet classifier.

The dense :class:`~online_gp_tpu.api.classification.OnlineSKIClassifier`
caps out at ``DENSE_GRID_LIMIT`` inducing points (its caches are m x m).
This wrapper runs the same Dirichlet-transform classification recipe
(reference ``online_gp/models/online_ski_classifier.py`` semantics) on
the rank-capped multi-output core
(``models/wiski_lowrank.py::wiski_lowrank_*_b``): per-class m x k roots,
k x k solves, structured Toeplitz/Kronecker K_uu MVMs — grids far past
the dense regime.

Capability deltas vs the dense classifier (the same asymmetry as the
low-rank regression route, warned at call sites):
- hyper+condition updates only — the ``sm_partial_mll`` stem objective
  needs the dense m x m predictive covariance cache;
- ``fit`` is hyper-only on the standing caches.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.likelihoods.dirichlet import dirichlet_transform
from online_gp_tpu.models.wiski_lowrank import (
    WiskiLowRankModel,
    lowrank_init_params_batched,
    wiski_lowrank_condition_b,
    wiski_lowrank_init_b,
    wiski_lowrank_mll_b,
    wiski_lowrank_predict_b,
)
from online_gp_tpu.ops.grid import Grid
from online_gp_tpu.api.stems import Stem


class OnlineSKILowRankClassifier:
    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        alpha_eps: float = 0.01,
        lr: float = 0.01,
        grid_size: int = 64,
        grid_bound: float = 1.0,
        num_classes: int = 2,
        rank: int = 256,
        kernel: str | Kernel = "rbf",
        use_toeplitz: bool = True,
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        **unused,
    ):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y).astype(jnp.int32).reshape(-1)
        self.stem = stem
        self.cfg = cfg
        self.lr = lr
        self.alpha_eps = alpha_eps
        self.num_classes = num_classes

        key = jax.random.PRNGKey(seed)
        self.stem_params, self.stem_state = stem.init(key)
        feats, self.stem_state = stem.apply(self.stem_params, self.stem_state, init_x, train=True)
        feats = jax.lax.stop_gradient(feats)

        targets, _, sigma2 = dirichlet_transform(init_y, num_classes, alpha_eps)

        grid = Grid.create([(-(grid_bound + 1e-1), grid_bound + 1e-1)] * stem.output_dim,
                           grid_size)
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        # like the dense classifier: fixed per-class heteroscedastic noise,
        # no learnable second noise
        self.model = WiskiLowRankModel(
            kernel, grid, rank=rank, learn_additional_noise=False,
            use_toeplitz=use_toeplitz,
        )
        self.params = lowrank_init_params_batched(self.model, stem.output_dim, num_classes)
        self.state = wiski_lowrank_init_b(
            self.model, feats, targets, sigma2, key=key, params=self.params
        )

        self.gp_opt = optax.adam(lr / 10.0)  # streaming convention (see
        # api/lowrank_regression.py: the full lr belongs to batch fit)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self._jit_cache: Dict = {}

    def _features(self, x):
        feats, _ = self.stem.apply(self.stem_params, self.stem_state, x, train=False)
        return jax.lax.stop_gradient(feats)

    # -- public API --------------------------------------------------------

    def predict(self, inputs) -> jnp.ndarray:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        key = ("predict", inputs.shape[0])
        if key not in self._jit_cache:
            model, cfg, stem = self.model, self.cfg, self.stem
            cfg_mean = cfg.replace(skip_posterior_variances=True)

            def fn(params, stem_params, bn_state, state, x):
                feats, _ = stem.apply(stem_params, bn_state, x, train=False)
                mean, _ = wiski_lowrank_predict_b(model, params, state, feats, cfg_mean)
                return jnp.argmax(mean, axis=0)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.state, inputs
        )

    def evaluate(self, inputs, labels) -> float:
        pred = self.predict(inputs)
        labels = jnp.asarray(labels).reshape(-1)
        return float(jnp.mean((pred == labels).astype(jnp.float32)))

    def update(self, inputs, labels, update_stem: bool = True, update_gp: bool = True):
        if update_stem and self.stem.has_params and not getattr(self, "_warned_stem", False):
            import warnings

            self._warned_stem = True
            warnings.warn(
                "low-rank classifier updates are hyper+condition only "
                "(see api/lowrank_regression.py) — update_stem is ignored",
                stacklevel=2,
            )
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        key = ("update", inputs.shape[0], update_gp)
        if key not in self._jit_cache:
            model, cfg, stem = self.model, self.cfg, self.stem
            cfg_skip = cfg.replace(skip_logdet_forward=True)
            gp_opt = self.gp_opt
            alpha_eps, C = self.alpha_eps, self.num_classes

            def fn(params, gp_opt_state, state, feats, lab):
                targets, _, sigma2 = dirichlet_transform(lab, C, alpha_eps)
                if update_gp:
                    loss, grads = jax.value_and_grad(
                        lambda p: -jnp.sum(wiski_lowrank_mll_b(model, p, state, cfg_skip))
                    )(params)
                    up, gp_opt_state = gp_opt.update(grads, gp_opt_state, params)
                    params = optax.apply_updates(params, up)
                else:
                    loss = jnp.asarray(0.0, feats.dtype)
                # per-output hypers make buffer compression kernel-aware
                state = wiski_lowrank_condition_b(
                    model, state, feats, targets, sigma2, params
                )
                return params, gp_opt_state, state, loss

            self._jit_cache[key] = jax.jit(fn)
        feats = self._features(inputs)
        self.params, self.gp_opt_state, self.state, loss = self._jit_cache[key](
            self.params, self.gp_opt_state, self.state, feats, labels
        )
        return 0.0, float(loss)

    def fit(self, inputs, labels, num_epochs: int, test_dataset=None):
        """Hyper-only fit on freshly-built caches (large-grid practice —
        see the low-rank regression wrapper's ``fit`` rationale)."""
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        feats = self._features(inputs)
        targets, _, sigma2 = dirichlet_transform(labels, self.num_classes, self.alpha_eps)
        self.state = wiski_lowrank_init_b(
            self.model, feats, targets, sigma2, params=self.params
        )
        model, cfg = self.model, self.cfg
        opt = optax.adam(self.lr)

        @jax.jit
        def epochs(params, state, opt_state):
            def step(carry, _):
                p, os_ = carry
                loss, grads = jax.value_and_grad(
                    lambda q: -jnp.sum(wiski_lowrank_mll_b(model, q, state, cfg))
                )(p)
                up, os_ = opt.update(grads, os_, p)
                return (optax.apply_updates(p, up), os_), loss

            (p, _), losses = jax.lax.scan(step, (params, opt_state), None, length=num_epochs)
            return p, losses

        self.params, losses = epochs(self.params, self.state, opt.init(self.params))
        records = []
        for e in range(num_epochs):
            rec = {"epoch": e + 1, "train_loss": float(losses[e])}
            if test_dataset is not None and e == num_epochs - 1:
                rec["test_acc"] = self.evaluate(*test_dataset)
            records.append(rec)
        return records

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        self.lr = gp_lr
        self.gp_opt = optax.adam(gp_lr / 10.0)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self._jit_cache = {}
