"""BayesOpt model adapter over the WISKI core.

Capability match for the reference's ``OnlineSKIBotorchModel``
(``online_gp/models/online_ski_botorch_model.py``): the thin object that
botorch acquisitions talk to — ``posterior(X)``, ``fantasize(X,
sampler)`` (mean-noise fantasies, lines 51-61), and
``condition_on_observations``. Here the adapter exposes the same verbs
over the functional core so acquisition code (ours in
:mod:`online_gp_tpu.bayesopt` or user code) can be model-agnostic.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from online_gp_tpu.config import SolverConfig, DEFAULT_CONFIG
from online_gp_tpu.models.wiski import (
    WiskiModel,
    WiskiState,
    wiski_condition,
    wiski_fantasize,
    wiski_predict,
    wiski_predict_root,
    wiski_mll,
)


class WiskiPosterior(NamedTuple):
    mean: jnp.ndarray  # (B, n)
    variance: jnp.ndarray  # (B, n)
    cov_root: Optional[jnp.ndarray]  # (B, n, m) joint-covariance root

    def sample(self, key, num_samples: int) -> jnp.ndarray:
        """(S, B, n) joint posterior samples."""
        if self.cov_root is None:
            eps = jax.random.normal(key, (num_samples,) + self.mean.shape, self.mean.dtype)
            return self.mean[None] + jnp.sqrt(self.variance)[None] * eps
        S = num_samples
        B, n, m = self.cov_root.shape
        eps = jax.random.normal(key, (S, B, m), self.mean.dtype)
        return self.mean[None] + jnp.einsum("sbm,bnm->sbn", eps, self.cov_root)


class WiskiBayesOptModel:
    """Stateful adapter: posterior / fantasize / condition over WISKI caches."""

    def __init__(self, model: WiskiModel, params: Dict, state: WiskiState,
                 cfg: SolverConfig = DEFAULT_CONFIG):
        self.model = model
        self.params = params
        self.state = state
        self.cfg = cfg

    @property
    def num_outputs(self) -> int:
        return self.model.num_outputs

    def posterior(self, X, observation_noise: bool = False, joint: bool = False) -> WiskiPosterior:
        X = jnp.asarray(X)
        if joint:
            mean, root = wiski_predict_root(self.model, self.params, self.state, X, self.cfg)
            var = jnp.sum(root**2, axis=-1)
        else:
            mean, var = wiski_predict(self.model, self.params, self.state, X, self.cfg)
            root = None
        if observation_noise and self.model.learn_additional_noise:
            var = var + jnp.exp(self.params["raw_second_noise"])[:, None]
        return WiskiPosterior(mean=mean, variance=var, cov_root=root)

    def fantasize(self, X, key, num_fantasies: int = 16, noise: Optional[jnp.ndarray] = None):
        """Sample fantasy observations at X and return an adapter whose
        output batch is the F*B flattened fantasy product (the reference's
        ``fantasize`` with expanded caches; mean-noise fantasies).

        The returned adapter's posteriors have leading dim F*B — reshape
        to (F, B, ...) with ``num_fantasies`` if needed.
        """
        X = jnp.asarray(X)
        post = self.posterior(X, joint=True)
        samples = post.sample(key, num_fantasies)  # (F, B, q)
        q = X.shape[0]
        F, B = num_fantasies, self.num_outputs
        if noise is None:
            noise = jnp.ones((q, B), X.dtype)
        fx = jnp.broadcast_to(X[None], (F,) + X.shape)
        fy = samples.swapaxes(-1, -2)  # (F, q, B)
        fn = jnp.broadcast_to(noise[None], (F, q, B))
        fant_state = wiski_fantasize(self.model, self.state, fx, fy, fn)
        # flatten the (F, B) leading dims so every core function sees a
        # plain batch; a WiskiModel with num_outputs=F*B matches shapes.
        flat_state = jax.tree.map(
            lambda a: a.reshape((F * B,) + a.shape[2:]) if a.ndim >= 2 else jnp.repeat(a, B),
            fant_state,
        )
        flat_model = self.model._replace(num_outputs=F * B)
        flat_params = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (F,) + a.shape).reshape((F * B,) + a.shape[1:]),
            self.params,
        )
        return WiskiBayesOptModel(flat_model, flat_params, flat_state, self.cfg)

    def condition_on_observations(self, X, Y, noise: Optional[jnp.ndarray] = None) -> "WiskiBayesOptModel":
        X = jnp.asarray(X)
        Y = jnp.asarray(Y).reshape(X.shape[0], self.num_outputs)
        if noise is None:
            noise = jnp.ones_like(Y)
        new_state = wiski_condition(self.model, self.state, X, Y, noise)
        return WiskiBayesOptModel(self.model, self.params, new_state, self.cfg)

    def mll(self) -> jnp.ndarray:
        return wiski_mll(self.model, self.params, self.state, self.cfg)


class SVGPBayesOptModel:
    """Posterior adapter over the SVGP core — the reference's
    ``ApproximateGPyTorchModel`` (``variational_gp_model.py:204-226``):
    the minimal `posterior(X, observation_noise=...)` surface acquisition
    code needs from a variational model."""

    def __init__(self, model, params, cfg: SolverConfig = DEFAULT_CONFIG):
        self.model = model
        self.params = params
        self.cfg = cfg

    @property
    def num_outputs(self) -> int:
        return 1

    def posterior(self, X, observation_noise: bool = False, joint: bool = False):
        from online_gp_tpu.models.svgp import svgp_predict
        from online_gp_tpu.ops.chol import psd_safe_cholesky

        X = jnp.asarray(X)
        if joint:
            mean, cov = svgp_predict(self.model, self.params, X, self.cfg, full_cov=True)
            root = psd_safe_cholesky(cov, jitter=self.model.jitter)
            var = jnp.diagonal(cov, axis1=-2, axis2=-1)
            post = WiskiPosterior(mean=mean[None], variance=var[None], cov_root=root[None])
        else:
            mean, var = svgp_predict(self.model, self.params, X, self.cfg)
            post = WiskiPosterior(mean=mean[None], variance=var[None], cov_root=None)
        if observation_noise and "raw_noise" in self.params:
            post = post._replace(variance=post.variance + jnp.exp(self.params["raw_noise"]))
        return post
