"""Task-level API wrappers (the reference's L5 surface).

Uniform interface across all wrappers: ``fit(x, y, num_epochs,
test_dataset)``, ``update(x, y, ...)``, ``predict(x)``,
``evaluate(x, y)``, ``set_lr(...)``, ``.noise`` — matching the reference's
``online_gp/models/online_*_{regression,classifier}.py`` so experiment
drivers port mechanically.
"""

from online_gp_tpu.api.stems import IdentityStem, LinearStem, MLPStem, make_stem
from online_gp_tpu.api.regression import OnlineSKIRegression
from online_gp_tpu.api.classification import OnlineSKIClassifier
from online_gp_tpu.api.svgp import OnlineSVGPRegression, OnlineSVGPClassifier
from online_gp_tpu.api.sgpr_regression import OnlineSGPRegression
from online_gp_tpu.api.exact import OnlineExactRegression, OnlineExactClassifier
from online_gp_tpu.api.localgp import OnlineLocalGPRegression
from online_gp_tpu.api.lowrank_regression import OnlineSKILowRankRegression
from online_gp_tpu.api.lowrank_classification import OnlineSKILowRankClassifier

__all__ = [
    "IdentityStem",
    "LinearStem",
    "MLPStem",
    "make_stem",
    "OnlineSKIRegression",
    "OnlineSKIClassifier",
    "OnlineSVGPRegression",
    "OnlineSVGPClassifier",
    "OnlineSGPRegression",
    "OnlineExactRegression",
    "OnlineExactClassifier",
    "OnlineLocalGPRegression",
    "OnlineSKILowRankRegression",
    "OnlineSKILowRankClassifier",
]
