"""Dirichlet-GP streaming classification (WISKI backbone).

Capability match for the reference's ``DirichletGPClassifier`` base
(``online_gp/models/gp_dirichlet_classification.py``) and
``OnlineSKIClassifier`` (``online_gp/models/online_ski_classifier.py``):
integer labels are Dirichlet-transformed into per-class regression targets
with per-class heteroscedastic noise (see
:mod:`online_gp_tpu.likelihoods.dirichlet`), a B=num_classes batched WISKI
GP regresses them, and prediction is the argmax of the class posterior
means. The online ``update`` is stem step (targets y/sigma^2, reference
line 112) -> GP hyper step -> conditioning with the transformed noise.
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
from online_gp_tpu.models.wiski import (
    WiskiModel,
    wiski_init,
    wiski_condition,
    wiski_mll,
    wiski_predict,
)
from online_gp_tpu.models.partial_mll import sm_partial_mll
from online_gp_tpu.likelihoods.dirichlet import dirichlet_transform
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.buffers import ReplayBuffer


class OnlineSKIClassifier:
    """Dirichlet-transform SKI classifier.

    Like the flagship regression wrapper, covers both WISKI regimes
    behind one constructor: the dense O(m^2) core up to the dense grid
    limit, and the rank-capped structured core
    (:class:`~online_gp_tpu.api.lowrank_classification.OnlineSKILowRankClassifier`)
    above it or when ``low_rank=`` is passed explicitly."""

    def __new__(
        cls,
        stem: Stem = None,
        init_x=None,
        init_y=None,
        alpha_eps: float = 0.01,
        lr: float = 0.01,
        grid_size: int = 30,
        grid_bound: float = 1.0,
        num_classes: int = 2,
        kernel: str | Kernel = "rbf",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        low_rank=None,
        **unused,
    ):
        if cls is OnlineSKIClassifier and stem is not None:
            from online_gp_tpu.api.regression import DENSE_GRID_LIMIT

            m = grid_size ** stem.output_dim
            if low_rank is not None or m > DENSE_GRID_LIMIT:
                from online_gp_tpu.api.lowrank_classification import (
                    OnlineSKILowRankClassifier,
                )

                return OnlineSKILowRankClassifier(
                    stem, init_x, init_y, alpha_eps=alpha_eps, lr=lr,
                    grid_size=grid_size, grid_bound=grid_bound,
                    num_classes=num_classes, rank=low_rank or 512,
                    kernel=kernel, cfg=cfg, seed=seed, **unused,
                )
        return super().__new__(cls)

    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        alpha_eps: float = 0.01,
        lr: float = 0.01,
        grid_size: int = 30,
        grid_bound: float = 1.0,
        num_classes: int = 2,
        kernel: str | Kernel = "rbf",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        low_rank=None,
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

        grid_bound = grid_bound + 1e-1
        if grid_size**stem.output_dim > 65536:
            raise ValueError(
                f"SKI grid {grid_size}^{stem.output_dim} = {grid_size**stem.output_dim} inducing "
                "points is infeasible; use a dimensionality-reducing stem "
                "(e.g. LinearStem/MLPStem with feature_dim<=3) or a smaller grid"
            )
        grid = Grid.create([(-grid_bound, grid_bound)] * stem.output_dim, grid_size)
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        # fixed-noise GP over the transformed targets; no learnable second
        # noise (reference passes sigma2_i as the noise term directly)
        self.model = WiskiModel(kernel, grid, num_outputs=num_classes, learn_additional_noise=False)
        self.params = self.model.init_params(stem.output_dim)
        self._init_fn = jax.jit(lambda f, t, n: wiski_init(self.model, f, t, n))
        self.state = self._init_fn(feats, targets, sigma2)

        self.gp_opt = optax.adam(lr)
        self.gp_opt_state = self.gp_opt.init(self.params)
        self.stem_opt = optax.adam(lr)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self.buffer = ReplayBuffer(np.asarray(init_x))
        self._jit_cache: Dict = {}

    # -- jitted building blocks -------------------------------------------

    def _update_fn(self, q: int, update_stem: bool = True, update_gp: bool = True):
        key = ("update", q, update_stem, update_gp)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, stem = self.model, self.cfg, self.stem
        cfg_skip = cfg.replace(skip_logdet_forward=True)
        gp_opt, stem_opt = self.gp_opt, self.stem_opt
        alpha_eps, C = self.alpha_eps, self.num_classes

        def fn(params, stem_params, bn_state, gp_opt_state, stem_opt_state, state, x, labels):
            targets, _, sigma2 = dirichlet_transform(labels, C, alpha_eps)

            def stem_loss(sp):
                feats, _ = stem.apply(sp, bn_state, x, train=False)
                return -jnp.sum(sm_partial_mll(model, params, state, feats, targets / sigma2, cfg))

            if stem.has_params and update_stem:
                s_loss, s_grads = jax.value_and_grad(stem_loss)(stem_params)
                s_up, stem_opt_state = stem_opt.update(s_grads, stem_opt_state, stem_params)
                stem_params = optax.apply_updates(stem_params, s_up)
            else:
                s_loss = jnp.asarray(0.0)

            def gp_loss_fn(p):
                return -jnp.sum(wiski_mll(model, p, state, cfg_skip))

            if update_gp:
                g_loss, g_grads = jax.value_and_grad(gp_loss_fn)(params)
                g_up, gp_opt_state = gp_opt.update(g_grads, gp_opt_state, params)
                params = optax.apply_updates(params, g_up)
            else:
                g_loss = jnp.asarray(0.0)

            feats, _ = stem.apply(stem_params, bn_state, x, train=False)
            feats = jax.lax.stop_gradient(feats)
            state = wiski_condition(model, state, feats, targets, sigma2)
            return params, stem_params, gp_opt_state, stem_opt_state, state, s_loss, g_loss

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _predict_fn(self, n: int):
        key = ("predict", n)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, stem = self.model, self.cfg, self.stem
        cfg_eval = cfg.replace(detach_interp_coeff=True, skip_posterior_variances=True)

        def fn(params, stem_params, bn_state, state, x):
            feats, _ = stem.apply(stem_params, bn_state, x, train=False)
            mean, _ = wiski_predict(model, params, state, feats, cfg_eval)
            return jnp.argmax(mean, axis=0)  # (n,) class labels

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    # -- public API --------------------------------------------------------

    def predict(self, inputs) -> jnp.ndarray:
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        return self._predict_fn(inputs.shape[0])(
            self.params, self.stem_params, self.stem_state, self.state, inputs
        )

    def evaluate(self, inputs, labels) -> float:
        pred = self.predict(inputs)
        labels = jnp.asarray(labels).reshape(-1)
        return float(jnp.mean((pred == labels).astype(jnp.float32)))

    def absorb(self, inputs, labels):
        """Bulk-absorb a labeled stream (conditioning only — no hyper/stem
        steps): Dirichlet-transform the labels, then one exact rank-1
        update per point through :func:`wiski_stream`."""
        from online_gp_tpu.models.wiski import wiski_stream

        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        key = ("absorb", inputs.shape[0])
        if key not in self._jit_cache:
            model, stem = self.model, self.stem
            alpha_eps, C = self.alpha_eps, self.num_classes

            def fn(params, stem_params, bn_state, state, x, lab):
                targets, _, sigma2 = dirichlet_transform(lab, C, alpha_eps)
                feats, _ = stem.apply(stem_params, bn_state, x, train=False)
                feats = jax.lax.stop_gradient(feats)
                return wiski_stream(model, state, feats, targets, sigma2)

            self._jit_cache[key] = jax.jit(fn)
        self.state = self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.state, inputs, labels
        )
        self.buffer.append(np.asarray(inputs))
        return self.state

    def update(self, inputs, labels, update_stem: bool = True, update_gp: bool = True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
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
            labels,
        )
        self.buffer.append(np.asarray(inputs))
        if update_stem and self.stem.has_params:
            replay = jnp.asarray(self.buffer.sample(1024))
            batch = jnp.concatenate([inputs, replay])
            _, self.stem_state = self.stem.apply(self.stem_params, self.stem_state, batch, train=True)
        return float(s_loss), float(g_loss)

    def fit(self, inputs, labels, num_epochs: int, test_dataset=None):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        model, cfg, stem = self.model, self.cfg, self.stem
        targets, _, sigma2 = dirichlet_transform(labels, self.num_classes, self.alpha_eps)

        sched = optax.cosine_decay_schedule(self.lr, max(num_epochs, 1), alpha=1e-4 / self.lr)
        gp_opt = optax.adam(sched)
        stem_opt = optax.adam(sched)
        gp_os = gp_opt.init(self.params)
        stem_os = stem_opt.init(self.stem_params)

        @jax.jit
        def epoch_step(params, stem_params, bn_state, gp_os, stem_os):
            def loss_fn(p, sp):
                feats, new_bn = stem.apply(sp, bn_state, inputs, train=True)
                st = wiski_init(model, feats, targets, sigma2)
                return -jnp.sum(wiski_mll(model, p, st, cfg)), new_bn

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
            ) = epoch_step(self.params, self.stem_params, self.stem_state, gp_os, stem_os)
            test_acc = float("nan")
            if test_dataset is not None:
                self._refresh_state(inputs, targets, sigma2)
                test_x, test_y = test_dataset
                test_acc = self.evaluate(test_x, test_y)
            records.append({"epoch": epoch + 1, "train_loss": float(loss), "test_acc": test_acc})

        self._refresh_state(inputs, targets, sigma2)
        return records

    def _refresh_state(self, inputs, targets, sigma2):
        feats, _ = self.stem.apply(self.stem_params, self.stem_state, inputs, train=False)
        feats = jax.lax.stop_gradient(feats)
        self.state = self._init_fn(feats, targets, sigma2)

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
