"""Active-learning loop smokes (qNIPV WISKI/exact + MPV-OSVGP)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_qnipv_wiski_reduces_variance():
    from online_gp_tpu.bayesopt.active_learning import run_active_learning

    out = run_active_learning(model_type="wiski", num_steps=5, num_init=40,
                              num_test=200, grid_size=12, fit_iters=30, verbose=False)
    recs = out["records"]
    assert len(recs) == 5
    assert all(np.isfinite(r["test_rmse"]) for r in recs)
    assert recs[-1]["avg_variance"] < recs[0]["avg_variance"]


@pytest.mark.slow
def test_qnipv_exact_arm_runs():
    from online_gp_tpu.bayesopt.active_learning import run_active_learning

    out = run_active_learning(model_type="exact", num_steps=3, num_init=40,
                              num_test=200, fit_iters=30, verbose=False)
    assert np.isfinite(out["records"][-1]["test_rmse"])


@pytest.mark.slow
def test_mpv_osvgp_runs_and_contracts_variance():
    from online_gp_tpu.bayesopt.mpv_osvgp import run_mpv_osvgp

    out = run_mpv_osvgp(num_steps=4, num_init=40, num_test=200, num_inducing=24,
                        fit_iters=80, refit_iters=8, verbose=False)
    recs = out["records"]
    assert len(recs) == 4
    assert all(np.isfinite(r["test_rmse"]) for r in recs)
    assert recs[-1]["avg_variance"] <= recs[0]["avg_variance"] + 1e-3
