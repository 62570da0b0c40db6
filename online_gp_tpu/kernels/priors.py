"""Hyperparameter priors.

The reference registers Gamma priors on SKI lengthscale/outputscale in the
active-learning experiment (``experiments/active_learning/qnIPV_experiment.py:85-103``)
and adds registered prior log-probs into the Woodbury MLL
(``online_gp/mlls/batched_woodbury_marginal_log_likelihood.py:49-50``).
Here priors are plain records evaluated on *constrained* values
(the exp of raw params), summed into the objective by the model.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp


class GammaPrior(NamedTuple):
    """log p(x) = a*log(b) - lgamma(a) + (a-1)*log(x) - b*x."""

    concentration: float
    rate: float

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        a, b = self.concentration, self.rate
        return (
            a * jnp.log(jnp.asarray(b, x.dtype))
            - jax.scipy.special.gammaln(jnp.asarray(a, x.dtype))
            + (a - 1.0) * jnp.log(x)
            - b * x
        )


class NormalPrior(NamedTuple):
    loc: float
    scale: float

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        z = (x - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(jnp.asarray(self.scale, x.dtype)) - 0.9189385332046727


def log_prior_sum(
    priors: Optional[Dict[str, object]],
    params: Dict[str, jnp.ndarray],
    transforms: Optional[Dict[str, object]] = None,
) -> jnp.ndarray:
    """Sum prior log-probs over named params.

    ``priors`` maps a raw-param name (e.g. ``raw_lengthscale``) to a prior
    evaluated on the *constrained* value — mirroring constrained-space
    priors in the reference. ``transforms`` (the kernel's raw→constrained
    reparam map, see :class:`online_gp_tpu.kernels.base.Kernel`) defaults
    to exp for every param when absent.
    """
    total = jnp.asarray(0.0)
    if not priors:
        return total
    for name, prior in priors.items():
        raw = params[name]
        tf = transforms.get(name) if transforms else None
        value = tf.forward(raw) if tf is not None else jnp.exp(raw)
        total = total + jnp.sum(prior.log_prob(value))
    return total
