"""Online SVGP task wrappers (regression + classification).

Reference semantics (``online_gp/models/online_svgp_regression.py`` /
``online_svgp_classifier.py``):

- three optimizer groups: raw hypers at lr, variational params + inducing
  points + stem at lr/10 (``param_groups``, regression lines 141-151),
- ``fit``: streaming off, shuffled 1024-minibatch ELBO epochs with
  beta=1.0 and cosine LR (lines 57-91),
- ``update``: snapshot the old variational/prior dists, then
  ``num_update_steps`` ELBO steps with beta=prior_beta and the Bui
  streaming KL correction (lines 106-127),
- regression predicts with observation noise added; classification is
  probit-Bernoulli with p >= 0.5 decisions.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.kernels.base import make_kernel, Kernel
from online_gp_tpu.models.svgp import (
    SVGPModel,
    SVGPOldState,
    svgp_predict,
    svgp_elbo,
    svgp_snapshot,
    svgp_streaming_correction,
    svgp_closed_form_update,
    svgp_exact_estep,
    svgp_init_variational_to_prior,
)
from online_gp_tpu.likelihoods.bernoulli import bernoulli_probit_predictive
from online_gp_tpu.api.stems import Stem
from online_gp_tpu.utils.buffers import ReplayBuffer
from online_gp_tpu.utils.metrics import batched_rmse_nll


def _group_label(path: str) -> str:
    if path.startswith(("z", "var_mean", "var_chol")):
        return "variational"
    return "hyper"


def _make_optimizer(lr: float, variational_mode: str = "grad"):
    """hyper @ lr, variational @ lr/10 (reference param_groups).

    Under ``variational_mode="closed_form"`` the variational group is
    frozen for gradient steps — q(u) moves only through the exact
    streaming update (variational EM: closed-form E-step, gradient
    M-step on the hypers).

    The chain is fronted by ``optax.zero_nans``: the f32 online ELBO +
    streaming-correction gradient on TPU sits close enough to the
    factorization cliff that a borderline step can emit a non-finite
    gradient (round-5 five-model showdown: 3 of 6 chip arms lost their
    posterior to one poisoned step; the identical f32 program on CPU is
    healthy). Zeroing the offending leaf turns that step into a no-op
    for that leaf instead of destroying the state — healthy gradients
    are untouched. The reference (f64 torch on CPU) never needed the
    guard; this is the same policy as the wiski-path robustness guards
    (noise clamp / jitter escalation, SURVEY §5)."""
    def label_fn(params):
        return {k: _group_label(k) for k in params}

    var_opt = (
        optax.set_to_zero() if variational_mode == "closed_form"
        else optax.adam(lr / 10.0)
    )
    return optax.chain(
        optax.zero_nans(),
        optax.multi_transform(
            {"hyper": optax.adam(lr), "variational": var_opt}, label_fn
        ),
    )


class _OnlineSVGPBase:
    likelihood = "gaussian"

    def __init__(
        self,
        stem: Stem,
        init_x,
        init_y,
        num_inducing: int = 64,
        lr: float = 0.01,
        streaming: bool = False,
        prior_beta: float = 1.0,
        online_beta: float = 1.0,
        num_update_steps: int = 1,
        kernel: str | Kernel = "rbf",
        inducing_points=None,
        variational_mode: str = "grad",
        cfg: SolverConfig = DEFAULT_CONFIG,
        seed: int = 0,
        **unused,
    ):
        init_x = jnp.asarray(init_x)
        self.stem = stem
        self.cfg = cfg
        self.lr = lr
        self.streaming = streaming
        self.prior_beta = prior_beta
        self.online_beta = online_beta
        self.num_update_steps = num_update_steps
        if variational_mode not in ("grad", "closed_form"):
            raise ValueError(
                f"variational_mode {variational_mode!r} (grad/closed_form)"
            )
        if variational_mode == "closed_form" and self.likelihood != "gaussian":
            raise ValueError(
                "closed_form variational updates need a conjugate (gaussian) "
                "likelihood; the probit-Bernoulli classifier trains q(u) by "
                "gradient"
            )
        self.variational_mode = variational_mode

        key = jax.random.PRNGKey(seed)
        k_stem, k_z = jax.random.split(key)
        self.stem_params, self.stem_state = stem.init(k_stem)
        if inducing_points is None:
            inducing_points = jax.random.uniform(
                k_z, (num_inducing, stem.output_dim), minval=-1.0, maxval=1.0
            )
        if isinstance(kernel, str):
            kernel = make_kernel(kernel)
        self.model = SVGPModel(kernel, likelihood=self.likelihood)
        self.params = self.model.init_params(inducing_points, stem.output_dim)
        self.params = svgp_init_variational_to_prior(self.model, self.params)
        self.old: Optional[SVGPOldState] = None

        self.opt = _make_optimizer(lr, variational_mode)
        self.opt_state = self.opt.init(self.params)
        # zero_nans: same online-step robustness guard as the GP group
        # (see _make_optimizer) — the stem shares the loss whose gradient
        # can go non-finite on-chip
        self.stem_opt = optax.chain(optax.zero_nans(), optax.adam(lr / 10.0))
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self.buffer = ReplayBuffer(np.asarray(init_x))
        self._jit_cache: Dict = {}

    # -- shared jitted steps ----------------------------------------------

    def _train_step_fn(self, q: int, num_data: int, beta: float, use_streaming: bool,
                       replay_n: int = 0):
        key = ("train", q, num_data, beta, use_streaming, replay_n)
        if key in self._jit_cache:
            return self._jit_cache[key]
        model, cfg, stem = self.model, self.cfg, self.stem
        opt, stem_opt = self.opt, self.stem_opt
        online_beta = self.online_beta

        def fn(params, stem_params, bn_state, opt_state, stem_opt_state, old, x, y,
               replay=None):
            def loss_fn(p, sp):
                # BatchNorm on a lone streamed point would normalize it to
                # zero; the reference pads the batch with 1024 replayed
                # inputs and keeps only the new points' features
                # (``online_svgp_regression.py:153-163`` _get_features).
                if replay is not None:
                    feats_all, new_bn = stem.apply(
                        sp, bn_state, jnp.concatenate([x, replay]), train=True
                    )
                    feats = feats_all[:q]
                else:
                    feats, new_bn = stem.apply(sp, bn_state, x, train=True)
                loss = -svgp_elbo(model, p, feats, y, num_data, beta, cfg)
                if use_streaming:
                    loss = loss + svgp_streaming_correction(model, p, old, q, online_beta, cfg)
                return loss, new_bn

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

    # -- public API --------------------------------------------------------

    def fit(self, inputs, targets, num_epochs: int, test_dataset=None, batch_size: int = 1024,
            batch_stream: bool = True):
        """Shuffled minibatch ELBO epochs (reference ``fit``, regression
        lines 57-91). ``batch_stream=True`` (default) feeds host batches
        through :class:`online_gp_tpu.native.BatchStream` — the C++
        Fisher-Yates ring + memcpy row gather when the native .so is
        built, numpy fallback otherwise; ``False`` keeps the pure-numpy
        permutation path (fixed shuffle seed either way)."""
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets)
        n = inputs.shape[0]
        rng = np.random.default_rng(0)
        records = []
        sched = optax.cosine_decay_schedule(self.lr, max(num_epochs, 1), alpha=1e-4 / self.lr)
        closed = self.variational_mode == "closed_form"
        # fresh optimizers with the schedule for the fit phase; under
        # variational EM (m, S) move only through the exact E-step below,
        # while z keeps its gradient steps (the E-step is the optimum at
        # FIXED z; freezing z too leaves the inducing set wherever it was
        # seeded and the M-step compensates with runaway lengthscales)
        saved_opt = self.opt

        def _fit_label(k: str) -> str:
            if closed and k.startswith(("var_mean", "var_chol")):
                return "estep"
            return _group_label(k)

        self.opt = optax.multi_transform(
            {
                "hyper": optax.adam(sched),
                "variational": optax.adam(lambda c: sched(c) / 10.0),
                "estep": optax.set_to_zero(),
            },
            lambda params: {k: _fit_label(k) for k in params},
        )
        self.opt_state = self.opt.init(self.params)
        self.stem_opt = optax.adam(lambda c: sched(c) / 10.0)
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self._jit_cache = {}

        bs = min(batch_size, n)

        def estep():
            # variational-EM E-step: exact batch-optimal q(u) for the
            # current hypers/stem over the whole fit set
            feats = self._features(inputs)
            key = ("estep", feats.shape[0])
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda p, f, t: svgp_exact_estep(self.model, p, f, t)
                )
            self.params = self._jit_cache[key](self.params, feats, targets)

        stream = None
        if batch_stream:
            from online_gp_tpu.native import BatchStream

            stream = BatchStream(
                np.asarray(inputs), np.asarray(targets), batch_size=bs, shuffle=True, seed=0
            )

        if closed:
            estep()  # the hyper M-steps start from a sensible q(u)
        for epoch in range(num_epochs):
            perm = None if batch_stream else rng.permutation(n)
            avg_loss, num_batches = 0.0, 0
            for start in range(0, n - bs + 1, bs):
                if stream is not None:
                    xb, yb = stream.next()
                else:
                    idx = perm[start : start + bs]
                    xb, yb = inputs[idx], targets[idx]
                step = self._train_step_fn(bs, n, 1.0, False)
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
                    None,
                    xb,
                    yb,
                )
                avg_loss += float(loss)
                num_batches += 1
            if closed:
                estep()  # re-sync q(u) after the epoch's hyper/stem moves
            records.append(self._fit_record(epoch, avg_loss / max(num_batches, 1), test_dataset))

        self.opt = saved_opt
        self.opt_state = self.opt.init(self.params)
        self._jit_cache = {}
        if self.streaming:
            self.old = svgp_snapshot(self.model, self.params)
        return records

    def update(self, inputs, targets, update_stem: bool = True):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets)
        q = inputs.shape[0]
        use_streaming = self.streaming
        if self.variational_mode == "closed_form":
            # variational EM — E-step: the exact Bui streaming optimum for
            # q(u) given the current hypers (snapshots self.old itself);
            # the gradient loop below is then the M-step on the hypers
            # only (the optimizer zeroes the variational group).
            self.closed_form_update(inputs, targets)
        elif use_streaming:
            self.old = svgp_snapshot(self.model, self.params)
        replay_n = 1024 if self.stem.has_params else 0
        step = self._train_step_fn(q, q, self.prior_beta, use_streaming, replay_n)
        loss = jnp.nan
        for _ in range(self.num_update_steps):
            args = [
                self.params,
                self.stem_params,
                self.stem_state,
                self.opt_state,
                self.stem_opt_state,
                self.old,
                inputs,
                targets,
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
        self.buffer.append(np.asarray(inputs))
        return float(loss), float(loss)

    def closed_form_update(self, inputs, targets):
        """The reference's ``update_variational_parameters`` arm (used by
        the BayesOpt osvgp variant and by ``variational_mode="closed_form"``)."""
        feats = self._features(jnp.asarray(inputs).reshape(-1, self.stem.input_dim))
        key = ("cfu", feats.shape[0])
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                lambda p, f, y: (
                    svgp_snapshot(self.model, p),
                    svgp_closed_form_update(self.model, p, f, y),
                )
            )
        self.old, self.params = self._jit_cache[key](
            self.params, feats, jnp.asarray(targets)
        )

    def set_lr(self, gp_lr: float, stem_lr: Optional[float] = None, bn_mom: Optional[float] = None):
        self.lr = gp_lr
        self.opt = _make_optimizer(gp_lr, self.variational_mode)
        self.opt_state = self.opt.init(self.params)
        self.stem_opt = optax.chain(
            optax.zero_nans(),
            optax.adam((stem_lr if stem_lr is not None else gp_lr) / 10.0),
        )
        self.stem_opt_state = self.stem_opt.init(self.stem_params)
        self._jit_cache = {}

    def _fit_record(self, epoch, loss, test_dataset):  # overridden per task
        raise NotImplementedError


class OnlineSVGPRegression(_OnlineSVGPBase):
    likelihood = "gaussian"

    def __init__(self, stem, init_x, init_y, **kw):
        init_y = jnp.asarray(init_y)
        assert init_y.ndim == 2
        self.target_dim = init_y.shape[-1]
        assert self.target_dim == 1, "multi-output O-SVGP: run one wrapper per output"
        super().__init__(stem, init_x, init_y, **kw)

    def _predict_impl(self, params, stem_params, bn_state, x):
        feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
        mean, var = svgp_predict(self.model, params, feats, self.cfg)
        var = var + jnp.exp(params["raw_noise"])
        return mean[:, None], var[:, None]

    def predict(self, inputs):
        # one-dispatch jitted predict: eager execution is ~25 ms/op on the
        # tunneled chip, which made evaluate() dispatch-bound
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        key = ("predict",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._predict_impl)
        return self._jit_cache[key](self.params, self.stem_params, self.stem_state, inputs)

    def evaluate(self, inputs, targets):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        targets = jnp.asarray(targets).reshape(-1, 1)
        return batched_rmse_nll(self.predict, inputs, targets)

    def _fit_record(self, epoch, loss, test_dataset):
        rmse = nll = float("nan")
        if test_dataset is not None:
            rmse, nll = self.evaluate(*test_dataset)
        return {
            "epoch": epoch + 1,
            "train_loss": loss,
            "test_rmse": rmse,
            "test_nll": nll,
            "noise": float(jnp.exp(self.params["raw_noise"])),
        }

    @property
    def noise(self):
        return jnp.exp(self.params["raw_noise"])


class OnlineSVGPClassifier(_OnlineSVGPBase):
    likelihood = "bernoulli"

    def __init__(self, stem, init_x, init_y, **kw):
        super().__init__(stem, init_x, jnp.asarray(init_y).reshape(-1, 1), **kw)

    def _predict_impl(self, params, stem_params, bn_state, x):
        feats, _ = self.stem.apply(stem_params, bn_state, x, train=False)
        mean, var = svgp_predict(self.model, params, feats, self.cfg)
        p = bernoulli_probit_predictive(mean, var)
        return (p >= 0.5).astype(jnp.int32), p

    def predict(self, inputs):
        inputs = jnp.asarray(inputs).reshape(-1, self.stem.input_dim)
        key = ("predict",)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._predict_impl)
        return self._jit_cache[key](self.params, self.stem_params, self.stem_state, inputs)

    def evaluate(self, inputs, labels):
        pred, _ = self.predict(inputs)
        labels = jnp.asarray(labels).reshape(-1)
        return float(jnp.mean((pred == labels).astype(jnp.float32)))

    def _fit_record(self, epoch, loss, test_dataset):
        acc = float("nan")
        if test_dataset is not None:
            acc = self.evaluate(*test_dataset)
        return {"epoch": epoch + 1, "train_loss": loss, "test_acc": acc}
