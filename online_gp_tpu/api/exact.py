"""Online exact-GP wrappers (regression + Dirichlet classification).

Reference semantics: ``OnlineExactRegression``
(``online_gp/models/online_exact_regression.py`` — ScaleKernel(RBF-ARD)
SingleTaskGP; update = append + one skip-logdet MLL step; fit = cosine
epochs) and ``OnlineExactClassifier``
(``online_gp/models/online_exact_classifier.py`` — FixedNoiseGP over
Dirichlet-transformed targets).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.models.exact_online import (
    ExactGPModel,
    ExactGPData,
    exact_data_init,
    exact_data_append,
    exact_gp_mll,
    exact_gp_posterior,
)
from online_gp_tpu.likelihoods.dirichlet import dirichlet_transform
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.metrics import batched_rmse_nll


class _ExactBase:
    def __init__(self, stem: Stem, init_x, lr: float, model: ExactGPModel, seed: int = 0):
        self.stem = stem
        self.lr = lr
        self.model = model
        key = jax.random.PRNGKey(seed)
        self.stem_params, self.stem_state = stem.init(key)
        self.opt = optax.adam(lr)
        self.params = model.init_params(stem.output_dim)
        self.opt_state = self.opt.init((self.params, self.stem_params))
        self._raw = [np.asarray(init_x)]
        self._jit_cache: Dict = {}

    def _features(self, x, train=False):
        feats, new_state = self.stem.apply(self.stem_params, self.stem_state, x, train=train)
        if train:
            self.stem_state = new_state
        return feats

    def _step_fn(self, cap: int):
        key = ("step", cap)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, stem, opt = self.model, self.stem, self.opt

        def fn(params, stem_params, bn_state, opt_state, raw_x, data):
            def loss_fn(p, sp):
                feats, _ = stem.apply(sp, bn_state, raw_x, train=False)
                d = data._replace(x=feats)
                return -jnp.sum(exact_gp_mll(model, p, d))

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, stem_params)
            up, opt_state = opt.update(grads, opt_state, (params, stem_params))
            params, stem_params = optax.apply_updates((params, stem_params), up)
            # refresh stored features from the UPDATED stem in the same
            # program (the reference dumps caches so features always track
            # the current stem); a separate eager refresh over the growing
            # raw buffer compiled a new op per stream step on the chip
            feats, _ = stem.apply(stem_params, bn_state, raw_x, train=False)
            data = data._replace(x=jnp.where(data.mask[:, None] > 0, feats, data.x))
            return params, stem_params, opt_state, data, loss

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _grad_step(self, data: ExactGPData):
        raw = np.asarray(self._raw[0])
        cap = data.x.shape[0]
        # pad host-side: a device at[]-set over the growing raw buffer is a
        # new shape (hence a fresh op compile) every stream step
        raw_padded = np.zeros((cap, raw.shape[1]), raw.dtype)
        raw_padded[: raw.shape[0]] = raw
        step = self._step_fn(cap)
        self.params, self.stem_params, self.opt_state, self.data, loss = step(
            self.params, self.stem_params, self.stem_state, self.opt_state,
            jnp.asarray(raw_padded), data
        )
        return float(loss)

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        self.opt = optax.adam(gp_lr)
        self.opt_state = self.opt.init((self.params, self.stem_params))
        self._jit_cache = {}

    def _predict_fn(self):
        """One-dispatch jitted predict (stem features + masked exact
        posterior). Eager op-by-op execution costs ~25 ms/op on the
        tunneled chip, which made the prequential evaluate->update loop
        dispatch-bound; jit retraces per (cap, query) shape only."""
        key = ("predict",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._predict_impl)
        return self._jit_cache[key]


class OnlineExactRegression(_ExactBase):
    def __init__(self, stem: Stem, init_x, init_y, lr: float = 0.01, kernel: str | Kernel = "rbf",
                 cfg: SolverConfig = DEFAULT_CONFIG, seed: int = 0, **unused):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y)
        assert init_y.ndim == 2
        self.target_dim = init_y.shape[-1]
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        model = ExactGPModel(kernel, num_outputs=self.target_dim, learn_noise=True)
        super().__init__(stem, init_x, lr, model, seed)
        feats = jax.lax.stop_gradient(self._features(init_x, train=True))
        self.data = exact_data_init(feats, init_y)
        self._raw_y = [np.asarray(init_y)]

    def update(self, inputs, targets, update_stem=True, update_gp=True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        self._raw = [np.concatenate([self._raw[0], np.asarray(inputs)])]
        self._raw_y = [np.concatenate([self._raw_y[0], np.asarray(targets)])]
        feats = jax.lax.stop_gradient(self._features(inputs))
        self.data = exact_data_append(self.data, feats, targets)
        loss = self._grad_step(self.data) if update_gp else 0.0
        return loss, loss

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        self._raw = [np.asarray(inputs)]
        self._raw_y = [np.asarray(targets)]
        feats = jax.lax.stop_gradient(self._features(inputs, train=True))
        self.data = exact_data_init(feats, targets)
        records = []
        for epoch in range(num_epochs):
            loss = self._grad_step(self.data)
            rmse = nll = float("nan")
            if test_dataset is not None:
                rmse, nll = self.evaluate(*test_dataset)
            records.append(
                {
                    "epoch": epoch + 1,
                    "train_loss": loss,
                    "test_rmse": rmse,
                    "test_nll": nll,
                    "noise": float(jnp.exp(self.params["raw_noise"]).mean()),
                }
            )
        return records

    def _predict_impl(self, params, stem_params, bn_state, data, x):
        feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
        mean, var = exact_gp_posterior(self.model, params, data, feats)
        var = var + jnp.exp(params["raw_noise"])[:, None]
        return mean.T, var.T

    def predict(self, inputs):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        return self._predict_fn()(
            self.params, self.stem_params, self.stem_state, self.data, inputs
        )

    def evaluate(self, inputs, targets):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, self.target_dim)
        return batched_rmse_nll(self.predict, inputs, targets)

    @property
    def noise(self):
        return jnp.exp(self.params["raw_noise"])


class OnlineExactClassifier(_ExactBase):
    """Fixed-noise exact GP over Dirichlet-transformed labels."""

    def __init__(self, stem: Stem, init_x, init_y, alpha_eps: float = 0.01, lr: float = 0.01,
                 num_classes: int = 2, kernel: str | Kernel = "rbf",
                 cfg: SolverConfig = DEFAULT_CONFIG, seed: int = 0, **unused):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y).astype(jnp.int32).reshape(-1)
        self.alpha_eps = alpha_eps
        self.num_classes = num_classes
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        model = ExactGPModel(kernel, num_outputs=num_classes, learn_noise=False)
        super().__init__(stem, init_x, lr, model, seed)
        targets, _, sigma2 = dirichlet_transform(init_y, num_classes, alpha_eps)
        feats = jax.lax.stop_gradient(self._features(init_x, train=True))
        self.data = exact_data_init(feats, targets, sigma2)
        self._raw_y = [np.asarray(init_y)]

    def update(self, inputs, labels, update_stem=True, update_gp=True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        targets, _, sigma2 = dirichlet_transform(labels, self.num_classes, self.alpha_eps)
        self._raw = [np.concatenate([self._raw[0], np.asarray(inputs)])]
        feats = jax.lax.stop_gradient(self._features(inputs))
        self.data = exact_data_append(self.data, feats, targets, sigma2)
        loss = self._grad_step(self.data) if update_gp else 0.0
        return loss, loss

    def fit(self, inputs, labels, num_epochs: int, test_dataset=None):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        labels = jnp.asarray(labels).astype(jnp.int32).reshape(-1)
        targets, _, sigma2 = dirichlet_transform(labels, self.num_classes, self.alpha_eps)
        self._raw = [np.asarray(inputs)]
        feats = jax.lax.stop_gradient(self._features(inputs, train=True))
        self.data = exact_data_init(feats, targets, sigma2)
        records = []
        for epoch in range(num_epochs):
            loss = self._grad_step(self.data)
            acc = float("nan")
            if test_dataset is not None:
                acc = self.evaluate(*test_dataset)
            records.append({"epoch": epoch + 1, "train_loss": loss, "test_acc": acc})
        return records

    def _predict_impl(self, params, stem_params, bn_state, data, x):
        feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
        mean, _ = exact_gp_posterior(self.model, params, data, feats)
        return jnp.argmax(mean, axis=0)

    def predict(self, inputs):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        return self._predict_fn()(
            self.params, self.stem_params, self.stem_state, self.data, inputs
        )

    def evaluate(self, inputs, labels):
        pred = self.predict(inputs)
        labels = jnp.asarray(labels).reshape(-1)
        return float(jnp.mean((pred == labels).astype(jnp.float32)))
