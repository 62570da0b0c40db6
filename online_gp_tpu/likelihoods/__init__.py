from online_gp_tpu.likelihoods.gaussian import gaussian_nll, fnmg_noise
from online_gp_tpu.likelihoods.dirichlet import dirichlet_transform
from online_gp_tpu.likelihoods.bernoulli import (
    bernoulli_probit_expected_log_prob,
    bernoulli_probit_predictive,
)

__all__ = [
    "gaussian_nll",
    "fnmg_noise",
    "dirichlet_transform",
    "bernoulli_probit_expected_log_prob",
    "bernoulli_probit_predictive",
]
