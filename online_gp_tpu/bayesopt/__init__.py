from online_gp_tpu.bayesopt.test_functions import make_test_function, TEST_FUNCTIONS
from online_gp_tpu.bayesopt.acquisitions import (
    q_expected_improvement,
    q_upper_confidence_bound,
    q_noisy_expected_improvement,
    q_knowledge_gradient,
    q_max_value_entropy,
    q_negative_integrated_posterior_variance,
)
from online_gp_tpu.bayesopt.optimize import optimize_acqf

__all__ = [
    "make_test_function",
    "TEST_FUNCTIONS",
    "q_expected_improvement",
    "q_upper_confidence_bound",
    "q_noisy_expected_improvement",
    "q_knowledge_gradient",
    "q_max_value_entropy",
    "q_negative_integrated_posterior_variance",
    "optimize_acqf",
]
