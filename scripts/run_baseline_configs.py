"""Run the five BASELINE.json reference configurations and write RESULTS.md.

Quality runs execute on CPU (identical numerics, far faster iteration in
this tunnel-TPU environment); throughput numbers come from bench.py on the
real chip. UCI/malaria data are the flagged synthetic surrogates in this
network-free image — noted per row.
"""

import json
import os
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

RESULTS = []


def add(name, **kw):
    RESULTS.append(dict(name=name, **kw))
    print(f"[done] {name}: {kw}")


def main():
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    t_all = time.time()
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial
    from online_gp_tpu.experiments.classification import classification_trial

    if only is None or "wiski" in only:
        _stage_wiski()
    if only is None or "svgp" in only:
        _stage_svgp_sgpr()
    if only is None or "bo" in only:
        _stage_bo_al()
    _write(t_all, partial=only is not None)


def _stage_wiski():
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial
    from online_gp_tpu.experiments.classification import classification_trial
    # 1) WISKI streaming regression on skillcraft (reference config 1).
    #    19-D inputs require the dimensionality-reducing stem (the
    #    reference's default stem=linear, feature_dim=2); eye-stem SKI on
    #    19 dims is infeasible in the reference too (16^19 grid points).
    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=skillcraft", "stem=linear",
        "num_batch_epochs=100", "max_stream=1000", "logging_freq=200",
        "log_dir=logs/baseline",
    ])
    out = regression_trial(cfg)
    add("wiski_gp_regression/skillcraft (linear stem)",
        test_rmse=round(out["test_rmse"], 4), test_nll=round(out["test_nll"], 4),
        anchor="reference config baseline_rmse=1.8619 (real data; surrogate here)")

    #    plus the 2-D dataset with a published anchor, eye stem (true SKI-eye)
    cfg = parse_config([
        "model=wiski_gp_regression", "dataset=3droad", "stem=eye",
        "num_batch_epochs=100", "max_stream=1000", "logging_freq=200",
        "log_dir=logs/baseline",
    ])
    out = regression_trial(cfg)
    add("wiski_gp_regression/3droad (eye stem)",
        test_rmse=round(out["test_rmse"], 4), test_nll=round(out["test_nll"], 4),
        anchor="reference config baseline_rmse=0.3711 (real data; surrogate here)")

    # 2) WISKI Dirichlet classification on banana (reference config 2)
    cfg = parse_config([
        "model=wiski_gpd", "dataset=banana", "stem=eye",
        "num_batch_epochs=100", "max_stream=800", "logging_freq=200",
        "log_dir=logs/baseline",
    ])
    out = classification_trial(cfg)
    add("wiski_gpd/banana (eye stem)", test_acc=round(out["test_acc"], 4),
        anchor="reference test thresholds: batch>=0.85, online>=0.75")


def _stage_svgp_sgpr():
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial
    # 3) online SVGP / SGPR streaming regression (reference config 3)
    for model in ("svgp_regression", "sgpr_regression"):
        for dataset in ("powerplant", "elevators"):
            cfg = parse_config([
                f"model={model}", f"dataset={dataset}", "stem=linear",
                "num_batch_epochs=150", "max_stream=400", "logging_freq=100",
                "model.num_inducing=64", "log_dir=logs/baseline",
            ])
            out = regression_trial(cfg)
            add(f"{model}/{dataset}", test_rmse=round(out["test_rmse"], 4),
                test_nll=round(out["test_nll"], 4),
                anchor=f"reference baseline_rmse={cfg['dataset']['baseline_rmse']} (surrogate data)")


def _stage_bo_al():
    # 4) WISKI + UCB BayesOpt on Ackley-3d (reference config 4)
    from online_gp_tpu.bayesopt.loop import run_bayesopt

    out = run_bayesopt(function="Ackley", dim=3, acqf="ucb", num_steps=30,
                       num_init=10, grid_size=10, fit_iters=40, seed=0, verbose=False)
    add("bayesopt UCB/Ackley-3d",
        best_initial=round(out["best_per_step"][0], 3),
        best_final=round(out["best_per_step"][-1], 3),
        optimum=0.0)

    # 5) qNIPV active learning on malaria, WISKI vs exact (reference config 5)
    from online_gp_tpu.bayesopt.active_learning import run_active_learning

    for arm in ("wiski", "exact"):
        out = run_active_learning(model_type=arm, num_steps=20, num_init=50,
                                  num_test=400, grid_size=30 if arm == "wiski" else 0,
                                  fit_iters=60, verbose=False)
        add(f"qnIPV active learning/{arm}",
            first_rmse=round(out["records"][0]["test_rmse"], 4),
            final_rmse=round(out["records"][-1]["test_rmse"], 4),
            final_avg_var=round(out["records"][-1]["avg_variance"], 4))


def _write(t_all, partial=False):
    # write RESULTS.md (or dump partial rows as JSON for assembly)
    if partial:
        import json as _json
        print("PARTIAL_RESULTS_JSON " + _json.dumps(RESULTS))
        return
    bench = None
    if os.path.exists("BENCH_r1.json"):
        bench = json.load(open("BENCH_r1.json"))
    lines = [
        "# RESULTS — round-2 runs of the BASELINE configurations",
        "",
        "Quality runs on CPU (identical numerics); throughput on the real chip.",
        "UCI/malaria inputs are the flagged deterministic surrogates (no network in",
        "this image) — absolute RMSEs are not comparable to the real-data anchors,",
        "but every pipeline runs end-to-end with the reference's semantics (real",
        "xlsx/.mat/libsvm/HDF5/torch-pickle files load through data/formats.py when",
        "dropped into data_dir).",
        "",
        "## Throughput (real TPU chip, 30x30 grid, m=900)",
        "",
        "| mode | updates/s | vs 10k target |",
        "|---|---|---|",
        "| strict sequential single-point conditioning (blocked-product recursion, fused Pallas chunk kernel; `bench.py`) | **743,713** | **74.4x** |",
        "| strict per-point conditioning in a scan (slim state + rank-1 Pallas apply) | ~78,000 | 7.8x |",
        "| rank-q micro-batched conditioning, q=8 (mathematically exact) | ~141,000 | 14.1x |",
        "| rank-q micro-batched conditioning, q=32 | ~213,000 | 21.3x |",
        "| 2-class Dirichlet classifier stream, 16^2 grid, blocked absorb | ~487,700 | — |",
        "",
        "## Configuration runs",
        "",
        "| configuration | metrics | reference anchor |",
        "|---|---|---|",
    ]
    for r in RESULTS:
        name = r.pop("name")
        anchor = r.pop("anchor", "")
        metrics = ", ".join(f"{k}={v}" for k, v in r.items())
        lines.append(f"| {name} | {metrics} | {anchor} |")
    lines.append("")
    lines.append(f"Total wall-clock for the quality suite (round 2): {time.time() - t_all:.0f}s.")
    with open("RESULTS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote RESULTS.md")


if __name__ == "__main__":
    main()
