"""Online SGPR streaming regression wrapper.

Reference semantics (``online_gp/models/online_sgpr_regression.py``):

- ``fit``: full-batch gradient epochs on the streaming collapsed bound
  with per-group LRs (likelihood/covar 1e-1, inducing 1e-2, stem 1e-2)
  and cosine annealing, then absorb the batch via the fantasy transition
  with resample_ratio=0 (lines 52-90),
- ``update``: ``num_update_steps`` bound steps (logp + trace), then absorb
  the batch (lines 105-128),
- predict adds observation noise.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.models.sgpr import (
    SGPRModel,
    SGPROldState,
    SGPRMoments,
    sgpr_bound,
    sgpr_moments,
    sgpr_absorb,
    sgpr_predict,
    sgpr_resample_z,
)
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.buffers import ReplayBuffer
from online_gp_tpu.utils.metrics import batched_rmse_nll


def _sgpr_optimizer(gp_lr: float, z_lr: float):
    def label_fn(params):
        return {k: ("z" if k == "z" else "hyper") for k in params}

    return optax.multi_transform({"hyper": optax.adam(gp_lr), "z": optax.adam(z_lr)}, label_fn)


class OnlineSGPRegression:
    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        num_inducing: int = 64,
        lr: float = 0.01,
        num_update_steps: int = 1,
        rebase_every: int = 25,
        jitter: float = 1e-4,
        kernel: str | Kernel = "rbf",
        inducing_points=None,
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        **unused,
    ):
        init_x = jnp.asarray(init_x)
        init_y = jnp.asarray(init_y)
        assert init_y.ndim == 2 and init_y.shape[-1] == 1
        self.stem = stem
        self.cfg = cfg
        self.lr = lr
        self.num_update_steps = num_update_steps
        # Moving hypers on every streaming step and re-projecting the
        # stored information through K_aa_old^-1 on every absorb
        # over-shrinks the posterior variance (round-1 RESULTS: NLL 27.5
        # on the powerplant surrogate — reference-identical behavior,
        # ``/root/reference/online_gp/models/streaming_sgpr.py:121-141``).
        # Instead, hyper movement and rebasing are COUPLED and periodic:
        # most steps exact-accumulate information with frozen hypers
        # (zero projection leakage, frames always consistent); every
        # ``rebase_every``-th step runs ``num_update_steps`` bound steps
        # and then re-expresses the summary in the new frame. On the
        # 4-d surrogate stream this takes online NLL from 1.8 to 0.1 at
        # identical hyper-step budget. ``rebase_every=1`` recovers the
        # reference's per-step behavior.
        self.rebase_every = max(1, rebase_every)
        self._absorbs_since_rebase = 0
        self.target_dim = 1

        key = jax.random.PRNGKey(seed)
        k_stem, k_z = jax.random.split(key)
        self.stem_params, self.stem_state = stem.init(k_stem)
        if inducing_points is None:
            inducing_points = jax.random.uniform(
                k_z, (num_inducing, stem.output_dim), minval=-1.0, maxval=1.0
            )
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        self.model = SGPRModel(kernel, jitter=jitter)
        self.params = self.model.init_params(inducing_points, stem.output_dim)
        self.old: Optional[SGPROldState] = None
        self.moments: Optional[SGPRMoments] = None

        self.opt = _sgpr_optimizer(lr, lr / 10.0)
        self.opt_state = self.opt.init(self.params)
        self.stem_opt = optax.adam(lr / 10.0)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self.buffer = ReplayBuffer(np.asarray(init_x))
        self._rng = jax.random.PRNGKey(seed + 1)
        self._jit_cache: Dict = {}

    # ------------------------------------------------------------------

    def _bound_step_fn(self, q: int, combine: bool, replay_n: int = 0):
        key = ("bound", q, combine, self.old is not None, replay_n)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, stem = self.model, self.stem
        opt, stem_opt = self.opt, self.stem_opt

        def fn(params, stem_params, bn_state, opt_state, stem_opt_state, old, x, y,
               replay=None):
            def loss_fn(p, sp):
                # BatchNorm over a lone streamed point would normalize it
                # to zero; pad with replayed inputs and keep only the new
                # points' features (reference ``online_sgpr_regression.py``
                # ``_get_features``, lines 152-162).
                if replay is not None:
                    feats_all, new_bn = stem.apply(
                        sp, bn_state, jnp.concatenate([x, replay]), train=True
                    )
                    feats = feats_all[:q]
                else:
                    feats, new_bn = stem.apply(sp, bn_state, x, train=True)
                if combine:
                    val = sgpr_bound(model, p, old, feats, y, combine_terms=True)
                else:
                    logp, trace, _, _ = sgpr_bound(model, p, old, feats, y, combine_terms=False)
                    val = logp + trace
                return -val, new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                params, stem_params
            )
            up, opt_state = opt.update(grads[0], opt_state, params)
            params = optax.apply_updates(params, up)
            if stem.has_params:
                sup, stem_opt_state = stem_opt.update(grads[1], stem_opt_state, stem_params)
                stem_params = optax.apply_updates(stem_params, sup)
            return params, stem_params, new_bn, opt_state, stem_opt_state, loss

        jitted = jax.jit(fn)
        self._jit_cache[key] = jitted
        return jitted

    def _features(self, x, train=False):
        feats, new_state = self.stem.apply(self.stem_params, self.stem_state, x, train=train)
        if train:
            self.stem_state = new_state
        return feats

    def _absorb(self, inputs, targets, resample_ratio: float = 0.0, rebase: bool = True):
        feats = jax.lax.stop_gradient(self._features(inputs))
        new_z = None
        if resample_ratio > 0:
            self._rng, sub = jax.random.split(self._rng)
            new_z = sgpr_resample_z(self.params, feats, resample_ratio, sub)
        self.params, self.old, self.moments = sgpr_absorb(
            self.model, self.params, self.old, self.moments, feats, targets.reshape(-1), new_z,
            rebase=rebase,
        )
        # no cache clear needed: the jit key already branches on old-state
        # existence; clearing here forced a recompile per streaming update

    # -- public API -----------------------------------------------------

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, 1)
        # reference per-group LRs for the fit phase
        saved = (self.opt, self.stem_opt)
        self.opt = _sgpr_optimizer(1e-1, 1e-2)
        self.opt_state = self.opt.init(self.params)
        self.stem_opt = optax.adam(1e-2)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self._jit_cache = {}

        records = []
        step = self._bound_step_fn(inputs.shape[0], True)
        for epoch in range(num_epochs):
            (
                self.params,
                self.stem_params,
                self.stem_state,
                self.opt_state,
                self.stem_opt_state,
                loss,
            ) = step(
                self.params,
                self.stem_params,
                self.stem_state,
                self.opt_state,
                self.stem_opt_state,
                self.old,
                inputs,
                targets.reshape(-1),
            )
            rmse = nll = float("nan")
            if test_dataset is not None:
                feats = jax.lax.stop_gradient(self._features(inputs))
                self.moments = sgpr_moments(self.model, self.params, self.old, feats, targets.reshape(-1))
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

        self._absorb(inputs, targets, resample_ratio=0.0)
        self.opt, self.stem_opt = saved
        self.opt_state = self.opt.init(self.params)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self._jit_cache = {}
        return records

    def update(self, inputs, targets, update_stem: bool = True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, 1)
        self._absorbs_since_rebase += 1
        hyper_step = (
            self.num_update_steps > 0
            and self._absorbs_since_rebase >= self.rebase_every
        )
        loss = jnp.nan
        if hyper_step:
            self._absorbs_since_rebase = 0
            replay_n = 1024 if self.stem.has_params else 0
            step = self._bound_step_fn(inputs.shape[0], False, replay_n)
            for _ in range(self.num_update_steps):
                args = [
                    self.params,
                    self.stem_params,
                    self.stem_state,
                    self.opt_state,
                    self.stem_opt_state,
                    self.old,
                    inputs,
                    targets.reshape(-1),
                ]
                if replay_n:
                    args.append(jnp.asarray(self.buffer.sample(replay_n)))
                (
                    self.params,
                    self.stem_params,
                    self.stem_state,
                    self.opt_state,
                    self.stem_opt_state,
                    loss,
                ) = step(*args)
        # filter steps exact-accumulate with frozen hypers; hyper steps
        # re-project the summary into the just-moved frame
        self._absorb(inputs, targets, resample_ratio=0.0, rebase=hyper_step)
        self.buffer.append(np.asarray(inputs))
        return float(loss), float(loss)

    def _predict_impl(self, params, stem_params, bn_state, moments, x):
        feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
        mean, var = sgpr_predict(self.model, params, moments, feats)
        var = var + jnp.exp(params["raw_noise"])
        return mean[:, None], var[:, None]

    def predict(self, inputs):
        # one-dispatch jitted predict: eager execution is ~25 ms/op on the
        # tunneled chip, which made evaluate() dispatch-bound
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        if self.moments is None:
            M = self.params["z"].shape[0]
            self.moments = SGPRMoments(
                var_mean=jnp.zeros((M,), inputs.dtype), var_chol=jnp.eye(M, dtype=inputs.dtype)
            )
        key = ("predict",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._predict_impl)
        return self._jit_cache[key](
            self.params, self.stem_params, self.stem_state, self.moments, inputs
        )

    def evaluate(self, inputs, targets):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, 1)
        return batched_rmse_nll(self.predict, inputs, targets)

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        stem_lr = gp_lr / 10.0 if stem_lr is None else stem_lr
        self.opt = _sgpr_optimizer(gp_lr, gp_lr / 10.0)
        self.opt_state = self.opt.init(self.params)
        self.stem_opt = optax.adam(stem_lr)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self._jit_cache = {}

    @property
    def noise(self):
        return jnp.exp(self.params["raw_noise"])
