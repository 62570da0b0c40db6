"""Local GP regression wrapper (kernel-routed expert mixture).

Reference semantics (``online_gp/models/online_localgp_regression.py``):
stream points route to the best non-full expert (top-half candidate
ranking), spawning experts on overflow; after routing, one joint
sum-of-experts MLL gradient step; prediction/NLL through the mixture.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.models.localgp import (
    LocalGPModel,
    localgp_init,
    localgp_route,
    localgp_add_point,
    localgp_joint_mll,
    localgp_predict,
    localgp_log_prob,
)
from online_gp_tpu.api.stems import Stem


class OnlineLocalGPRegression:
    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        lr: float = 0.01,
        max_data_per_model: int = 256,
        max_experts: int = 32,
        kernel: str | Kernel = "rbf",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        **unused,
    ):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y)
        assert init_y.ndim == 2 and init_y.shape[-1] == 1
        self.stem = stem
        self.cfg = cfg
        self.target_dim = 1
        key = jax.random.PRNGKey(seed)
        self.stem_params, self.stem_state = stem.init(key)
        feats, self.stem_state = stem.apply(self.stem_params, self.stem_state, init_x, train=True)
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        self.model = LocalGPModel(kernel, max_data_per_model, max_experts)
        self.params = self.model.init_params(stem.output_dim)
        self.state = localgp_init(self.model, jax.lax.stop_gradient(feats), init_y, seed)
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init((self.params, self.stem_params))
        self._jit_cache: Dict = {}

    def _features(self, x, train=False):
        feats, new_state = self.stem.apply(self.stem_params, self.stem_state, x, train=train)
        if train:
            self.stem_state = new_state
        return feats

    def _mll_step(self):
        key = "mll_step"
        if key not in self._jit_cache:
            model, opt = self.model, self.opt

            def fn(params, stem_params, opt_state, state):
                def loss_fn(p_and_sp):
                    p, sp = p_and_sp
                    return -localgp_joint_mll(model, p, state)

                loss, grads = jax.value_and_grad(loss_fn)((params, stem_params))
                up, opt_state = opt.update(grads, opt_state, (params, stem_params))
                params, stem_params = optax.apply_updates((params, stem_params), up)
                return params, stem_params, opt_state, loss

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def update(self, inputs, targets, *args, **kwargs):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1)
        feats = np.asarray(jax.lax.stop_gradient(self._features(inputs)))
        for i in range(len(feats)):
            expert = localgp_route(self.model, self.params, self.state, feats[i])
            if expert < 0:
                # spawn a new expert at the first inactive slot
                active = np.asarray(self.state.active)
                free = np.flatnonzero(active == 0)
                if len(free) == 0:
                    # pool exhausted: fall back to best non-full, else best
                    counts = np.asarray(self.state.counts)
                    order = np.argsort(counts)
                    expert = int(order[0])
                else:
                    expert = int(free[0])
            self.state = localgp_add_point(
                self.state, expert, jnp.asarray(feats[i]), jnp.asarray(targets[i])
            )
        step = self._mll_step()
        self.params, self.stem_params, self.opt_state, loss = step(
            self.params, self.stem_params, self.opt_state, self.state
        )
        return float(loss), float(loss)

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None):
        records = []
        step = self._mll_step()
        for epoch in range(num_epochs):
            self.params, self.stem_params, self.opt_state, loss = step(
                self.params, self.stem_params, self.opt_state, self.state
            )
            rmse = nll = float("nan")
            if test_dataset is not None:
                rmse, nll = self.evaluate(*test_dataset)
            records.append(
                {
                    "epoch": epoch + 1,
                    "train_loss": float(loss),
                    "test_rmse": rmse,
                    "test_nll": nll,
                    "noise": float(jnp.exp(self.params["raw_noise"])),
                }
            )
        return records

    def _predict_fn(self):
        """One-dispatch jitted predict (stem + mixture posterior): eager
        execution is ~25 ms/op on the tunneled chip."""
        key = ("predict",)
        if key not in self._jit_cache:
            def fn(params, stem_params, bn_state, state, x):
                feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
                return localgp_predict(self.model, params, state, feats)

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def predict(self, inputs):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        mean, var, _ = self._predict_fn()(
            self.params, self.stem_params, self.stem_state, self.state, inputs
        )
        return mean[:, None], var[:, None]

    def evaluate(self, inputs, targets):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1)
        key = ("evaluate",)
        if key not in self._jit_cache:
            def fn(params, stem_params, bn_state, state, x, y):
                feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
                mean, var, stats = localgp_predict(self.model, params, state, feats)
                rmse = jnp.sqrt(jnp.mean((mean - y) ** 2))
                nll = -jnp.mean(localgp_log_prob(stats, y))
                return rmse, nll

            self._jit_cache[key] = jax.jit(fn)
        rmse, nll = self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.state, inputs, targets
        )
        return float(rmse), float(nll)

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        self.opt = optax.adam(gp_lr)
        self.opt_state = self.opt.init((self.params, self.stem_params))
        self._jit_cache = {}

    @property
    def noise(self):
        return jnp.exp(self.params["raw_noise"])

    @property
    def num_experts(self):
        return int(np.asarray(self.state.active).sum())
