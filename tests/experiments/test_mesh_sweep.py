"""Generalized mesh sweep (VERDICT round-1 item 10): arbitrary
model/dataset/stem configs, vmapped over trials, sharded over the virtual
8-device mesh, one jitted program, one CSV per trial."""

import csv
import os

import jax
import numpy as np
import pytest

from online_gp_tpu.experiments.sweep import mesh_regression_sweep, run_sweep


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
@pytest.mark.slow
def test_mesh_sweep_arbitrary_config(tmp_path):
    num_trials = 8
    results = mesh_regression_sweep(
        num_trials,
        [
            "model=wiski_gp_regression",
            "dataset=powerplant",
            "stem=linear",
            "model.grid_size=8",
            "num_batch_epochs=10",
            "max_stream=48",
            "logging_freq=16",
            "subsample_ratio=0.05",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == num_trials
    for t, r in enumerate(results):
        assert np.isfinite(r["test_rmse"]) and np.isfinite(r["test_nll"])
        path = os.path.join(r["log_dir"], "online_metrics.csv")
        assert os.path.exists(path), f"trial {t} CSV missing"
        with open(path) as f:
            rows = list(csv.DictReader(f))
        assert rows, "empty online_metrics table"
        # reference schema columns present
        for col in ("stem_loss", "gp_loss", "online_rmse", "online_nll",
                    "regret", "test_rmse", "test_nll", "noise", "step_time"):
            assert col in rows[0], f"missing column {col}"
        # last row carries the final held-out metrics
        assert np.isclose(float(rows[-1]["test_rmse"]), r["test_rmse"], rtol=1e-5)
    # distinct seeds -> distinct streams -> (almost surely) distinct results
    assert len({round(r["test_rmse"], 9) for r in results}) > 1


def test_mesh_sweep_rejects_unsupported_model(tmp_path):
    with pytest.raises(ValueError, match="mode=mesh"):
        mesh_regression_sweep(2, ["model=svgp_regression", f"log_dir={tmp_path}"])
    # run_sweep dispatch: models without a vmappable mesh core still error
    with pytest.raises(ValueError, match="mode=mesh"):
        run_sweep(2, "mesh", ["model=localgp_regression", f"log_dir={tmp_path}"])


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_mesh_sweep_classification(tmp_path):
    """wiski_gpd trials vmapped over the mesh (VERDICT r2 item 8)."""
    results = run_sweep(
        4,
        "mesh",
        [
            "model=wiski_gpd",
            "dataset=banana",
            "stem=eye",
            "model.grid_size=8",
            "num_batch_epochs=10",
            "max_stream=48",
            "logging_freq=16",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == 4
    for r in results:
        assert 0.0 <= r["test_acc"] <= 1.0
        path = os.path.join(r["log_dir"], "online_metrics.csv")
        assert os.path.exists(path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        for col in ("stem_loss", "gp_loss", "online_acc", "batch_acc",
                    "regret", "test_acc", "step_time"):
            assert col in rows[0], col
        assert np.isclose(float(rows[-1]["test_acc"]), r["test_acc"], rtol=1e-5)
    # banana is learnable even in 48 streamed points on top of pretrain
    assert max(r["test_acc"] for r in results) >= 0.7


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_mesh_sweep_svgp_classification(tmp_path):
    """probit O-SVGP classification trials vmapped over the mesh."""
    results = run_sweep(
        4,
        "mesh",
        [
            "model=svgp_classification",
            "model.num_inducing=16",
            "model.num_update_steps=2",
            "dataset=banana",
            "stem=eye",
            "num_batch_epochs=20",
            "max_stream=32",
            "batch_size=4",
            "logging_freq=2",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == 4
    for r in results:
        assert 0.0 <= r["test_acc"] <= 1.0
        path = os.path.join(r["log_dir"], "online_metrics.csv")
        assert os.path.exists(path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        for col in ("gp_loss", "online_acc", "test_acc", "step_time"):
            assert col in rows[0], col
    # banana with 20 ELBO pretrain epochs beats chance on at least one trial
    assert max(r["test_acc"] for r in results) >= 0.6


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_mesh_sweep_sgpr_regression(tmp_path):
    """streaming O-SGPR trials vmapped over the mesh — hyper steps and
    information rebasing coupled every rebase_every chunks via lax.cond
    (VERDICT r2 item 8's SGPR arm)."""
    results = run_sweep(
        4,
        "mesh",
        [
            "model=sgpr_regression",
            "model.num_inducing=16",
            "model.num_update_steps=2",
            "model.rebase_every=3",
            "dataset=friedman",
            "dataset.input_dim=2",
            "stem=eye",
            "stem.input_dim=2",
            "num_batch_epochs=10",
            "max_stream=32",
            "batch_size=4",
            "logging_freq=1",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["test_rmse"]) and np.isfinite(r["test_nll"])
        path = os.path.join(r["log_dir"], "online_metrics.csv")
        assert os.path.exists(path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        # hyper steps fire only on rebase chunks -> gp_loss alternates
        # between finite (rebased) and nan (exact-accumulate) rows
        losses = [float(row["gp_loss"]) for row in rows]
        assert any(np.isfinite(l) for l in losses)
        assert any(np.isnan(l) for l in losses)
    assert len({round(r["test_rmse"], 9) for r in results}) > 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_mesh_sweep_svgp_regression(tmp_path):
    """streaming O-SVGP trials vmapped over the mesh (VERDICT r2 item 8)."""
    results = run_sweep(
        4,
        "mesh",
        [
            "model=svgp_regression",
            "model.num_inducing=16",
            "model.num_update_steps=2",
            "dataset=friedman",
            "dataset.input_dim=2",
            "stem=eye",
            "stem.input_dim=2",
            "num_batch_epochs=10",
            "max_stream=32",
            "batch_size=4",
            "logging_freq=4",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == 4
    for r in results:
        assert np.isfinite(r["test_rmse"]) and np.isfinite(r["test_nll"])
        path = os.path.join(r["log_dir"], "online_metrics.csv")
        assert os.path.exists(path)
        with open(path) as f:
            rows = list(csv.DictReader(f))
        for col in ("gp_loss", "online_rmse", "online_nll", "test_rmse",
                    "test_nll", "noise", "step_time"):
            assert col in rows[0], col
    # distinct seeds -> distinct streams/inits -> distinct results
    assert len({round(r["test_rmse"], 9) for r in results}) > 1


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs multi-device mesh")
def test_run_sweep_mesh_eye_stem(tmp_path):
    """eye stem + friedman through the run_sweep entry point."""
    results = run_sweep(
        4,
        "mesh",
        [
            "model=wiski_gp_regression",
            "dataset=friedman",
            "dataset.input_dim=2",
            "stem=eye",
            "stem.input_dim=2",
            "model.grid_size=8",
            "num_batch_epochs=5",
            "max_stream=32",
            f"log_dir={tmp_path}",
        ],
    )
    assert len(results) == 4
    assert all(np.isfinite(r["test_rmse"]) for r in results)
