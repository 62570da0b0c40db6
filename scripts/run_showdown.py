"""Five-model streaming showdown ON THE REAL CHIP (VERDICT r4 item 1).

Runs wiski / exact / svgp / sgpr / localgp streaming regression on >=2
streams x 3 seeds through experiments/regression.py — the reference's
prequential evaluate->update loop with regret-vs-batch bookkeeping
(reference experiments/regression.py:41-81) — and writes one table:
final test RMSE/NLL, cumulative prequential regret vs the batch oracle,
and per-step wall-clock, every number chip-produced.

    python scripts/run_showdown.py [--quick] [--only=model1,model2] \
        [--datasets=powerplant,elevators] [--seeds=0,1,2] [--out=docs/showdown_r5.json]

Runs on the default backend (the tunneled TPU chip). Results append to
docs/showdown_r5.json incrementally so an interrupted campaign resumes
by skipping completed rows.
"""

import csv
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401  (default backend = the chip; no CPU pin here)
import numpy as np

# tunnel compiles are minutes-slow; persist them across trials/reruns
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_driver_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

MODELS = [
    "wiski_gp_regression",
    "exact_gp_regression",
    "svgp_regression",
    "sgpr_regression",
    "localgp_regression",
]


def run_one(model, dataset, seed, quick=False):
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial

    overrides = [
        f"model={model}",
        f"dataset={dataset}",
        "stem=linear",
        f"seed={seed}",
        f"trial_id={seed}",
        "num_batch_epochs=60" if quick else "num_batch_epochs=100",
        "max_stream=200" if quick else "max_stream=500",
        "logging_freq=100",
        "log_dir=logs/showdown_r5",
    ]
    if model in ("svgp_regression", "sgpr_regression"):
        overrides.append("model.num_inducing=128")
    cfg = parse_config(overrides)
    np.random.seed(seed)
    t0 = time.time()
    out = regression_trial(cfg)
    wall = time.time() - t0

    # regret + step_time come from the online_metrics CSV the driver wrote
    metrics_path = os.path.join(out["log_dir"], "online_metrics.csv")
    regret = step_times = None
    with open(metrics_path) as f:
        rows = list(csv.DictReader(f))
    if rows:
        regret = float(rows[-1]["regret"])
        step_times = [float(r["step_time"]) for r in rows]
    return dict(
        model=model, dataset=dataset, seed=seed,
        test_rmse=round(out["test_rmse"], 4), test_nll=round(out["test_nll"], 4),
        regret=round(regret, 4) if regret is not None else None,
        mean_step_ms=round(1e3 * float(np.mean(step_times)), 2) if step_times else None,
        wall_s=round(wall, 1),
        backend=jax.default_backend(),
    )


def aggregate(rows):
    """mean +/- std over seeds per (model, dataset)."""
    table = {}
    for r in rows:
        table.setdefault((r["model"], r["dataset"]), []).append(r)
    agg = []
    for (model, dataset), rs in sorted(table.items()):
        def ms(key):
            vals = [r[key] for r in rs if r[key] is not None]
            if not vals:
                return "n/a"
            return f"{np.mean(vals):.4f}±{np.std(vals):.4f}"

        agg.append(dict(model=model, dataset=dataset, n_seeds=len(rs),
                        test_rmse=ms("test_rmse"), test_nll=ms("test_nll"),
                        regret=ms("regret"), mean_step_ms=ms("mean_step_ms")))
    return agg


def main():
    quick = "--quick" in sys.argv
    only = datasets = None
    out_path = "docs/showdown_r5.json"
    seeds = [0, 1, 2]
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        if a.startswith("--datasets="):
            datasets = a.split("=", 1)[1].split(",")
        if a.startswith("--seeds="):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    datasets = datasets or ["powerplant", "elevators"]
    models = [m for m in MODELS if only is None or any(o in m for o in only)]

    done = []
    if os.path.exists(out_path):
        done = json.load(open(out_path)).get("rows", [])
    have = {(r["model"], r["dataset"], r["seed"]) for r in done}

    rows = list(done)
    for dataset in datasets:
        for model in models:
            for seed in seeds:
                if (model, dataset, seed) in have:
                    print(f"[skip] {model}/{dataset}/seed{seed} (already done)")
                    continue
                print(f"[run] {model}/{dataset}/seed{seed}")
                r = run_one(model, dataset, seed, quick=quick)
                rows.append(r)
                print("[done]", json.dumps(r))
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                with open(out_path, "w") as f:
                    json.dump(dict(rows=rows, agg=aggregate(rows)), f, indent=1)

    agg = aggregate(rows)
    with open(out_path, "w") as f:
        json.dump(dict(rows=rows, agg=agg), f, indent=1)
    print("\n| model | dataset | seeds | test RMSE | test NLL | regret | step ms |")
    print("|---|---|---|---|---|---|---|")
    for a in agg:
        print(f"| {a['model']} | {a['dataset']} | {a['n_seeds']} | {a['test_rmse']} "
              f"| {a['test_nll']} | {a['regret']} | {a['mean_step_ms']} |")


if __name__ == "__main__":
    main()
