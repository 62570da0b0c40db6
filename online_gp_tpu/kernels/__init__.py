"""Stationary kernels, priors, and grid-kernel assembly.

Covers the reference's kernel surface (gpytorch ``RBFKernel``,
``MaternKernel`` (1/2, 3/2, 5/2), ``ScaleKernel`` + ARD, Gamma priors;
SURVEY.md §2.9) as pure functions over parameter pytrees.
"""

from online_gp_tpu.kernels.base import (
    ExpTransform,
    IntervalTransform,
    Kernel,
    RBFKernel,
    MaternKernel,
    make_kernel,
)
from online_gp_tpu.kernels.spectral_mixture import SpectralMixtureKernel, sm_init_from_data
from online_gp_tpu.kernels.grid_kernel import grid_kuu_dense, grid_kuu_factors, grid_kuu_mvm
from online_gp_tpu.kernels.priors import GammaPrior, log_prior_sum

__all__ = [
    "ExpTransform",
    "IntervalTransform",
    "Kernel",
    "SpectralMixtureKernel",
    "sm_init_from_data",
    "RBFKernel",
    "MaternKernel",
    "make_kernel",
    "grid_kuu_dense",
    "grid_kuu_factors",
    "grid_kuu_mvm",
    "GammaPrior",
    "log_prior_sum",
]
