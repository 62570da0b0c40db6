"""Core GP models (functional state + pure transforms)."""

from online_gp_tpu.models.wiski import (
    WiskiModel,
    WiskiState,
    wiski_init,
    wiski_condition,
    wiski_mll,
    wiski_predict,
    wiski_prediction_caches,
    wiski_fantasize,
    wiski_refresh_roots,
    wiski_check_decomposition,
    wiski_condition_coeffs,
    wiski_pred_cache_condition,
    wiski_prequential_stream,
    wiski_slim,
    wiski_stream,
    wiski_unslim,
)
from online_gp_tpu.models.partial_mll import sm_partial_mll
from online_gp_tpu.models.wiski_lowrank import (
    WiskiLowRankModel,
    WiskiLowRankState,
    wiski_lowrank_init,
    wiski_lowrank_condition,
    wiski_lowrank_mll,
    wiski_lowrank_predict,
)
from online_gp_tpu.models.wiski_bayesopt import WiskiBayesOptModel, WiskiPosterior
from online_gp_tpu.models.exact import (
    exact_mll,
    exact_posterior,
    ski_kernel_matrix,
)

__all__ = [
    "WiskiModel",
    "WiskiState",
    "wiski_init",
    "wiski_condition",
    "wiski_mll",
    "wiski_predict",
    "wiski_prediction_caches",
    "wiski_condition_coeffs",
    "wiski_slim",
    "wiski_pred_cache_condition",
    "wiski_prequential_stream",
    "wiski_stream",
    "wiski_unslim",
    "wiski_fantasize",
    "wiski_refresh_roots",
    "wiski_check_decomposition",
    "sm_partial_mll",
    "WiskiLowRankModel",
    "WiskiLowRankState",
    "wiski_lowrank_init",
    "wiski_lowrank_condition",
    "wiski_lowrank_mll",
    "wiski_lowrank_predict",
    "WiskiBayesOptModel",
    "WiskiPosterior",
    "exact_mll",
    "exact_posterior",
    "ski_kernel_matrix",
]
