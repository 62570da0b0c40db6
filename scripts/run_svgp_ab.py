"""O-SVGP variational-mode A/B on the baseline configs (VERDICT r4 item 2).

Runs svgp_regression with variational_mode in {grad, closed_form} on the
powerplant/elevators baseline configurations (same overrides as
scripts/run_baseline_configs.py stage 2: 150 batch epochs, 400-point
stream, 64 inducing) x seeds, plus an EM hyper-lr sweep arm, ON THE
DEFAULT BACKEND (the chip). Writes docs/svgp_ab_r5.json incrementally
and prints a markdown table.

    python scripts/run_svgp_ab.py [--seeds=0,1,2] [--out=docs/svgp_ab_r5.json]

Reference context: online_gp/models/variational_gp_model.py:149-202 is
the reference's O-SVGP online update (gradient steps on the ELBO +
streaming correction); variational_mode=closed_form replaces the E-step
with Bui et al.'s exact q(u) update (models/svgp.py::svgp_closed_form_update),
leaving gradients only on hypers.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: F401
import numpy as np

if "--cpu" in sys.argv:
    # fallback when the tunneled chip is unavailable (the axon
    # sitecustomize overrides JAX_PLATFORMS, so only this works)
    jax.config.update("jax_platforms", "cpu")

# tunnel compiles are minutes-slow; persist them across trials/reruns
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_driver_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ARMS = [
    # (label, variational_mode, base_lr override or None)
    ("grad", "grad", None),
    ("closed_form", "closed_form", None),
    # EM + hotter hyper lr: the E-step removes the variational params from
    # the gradient problem, so the hyper step can afford a larger rate —
    # the knob interaction VERDICT r4 asked to sweep
    ("closed_form_lr2x", "closed_form", 0.1),
]


def run_one(arm, dataset, seed):
    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.regression import regression_trial

    label, mode, lr = arm
    overrides = [
        "model=svgp_regression", f"dataset={dataset}", "stem=linear",
        "num_batch_epochs=150", "max_stream=400", "logging_freq=100",
        "model.num_inducing=64", f"model.variational_mode={mode}",
        f"seed={seed}", f"trial_id={seed}", f"log_dir=logs/svgp_ab_r5/{label}",
    ]
    if lr is not None:
        overrides.append(f"dataset.base_lr={lr}")
    cfg = parse_config(overrides)
    np.random.seed(seed)
    t0 = time.time()
    out = regression_trial(cfg)
    return dict(arm=label, dataset=dataset, seed=seed,
                test_rmse=round(out["test_rmse"], 4),
                test_nll=round(out["test_nll"], 4),
                wall_s=round(time.time() - t0, 1),
                backend=jax.default_backend())


def main():
    seeds = [0, 1, 2]
    out_path = "docs/svgp_ab_r5.json"
    for a in sys.argv[1:]:
        if a.startswith("--seeds="):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    rows = []
    if os.path.exists(out_path):
        rows = json.load(open(out_path)).get("rows", [])
    have = {(r["arm"], r["dataset"], r["seed"]) for r in rows}

    for dataset in ("powerplant", "elevators"):
        for arm in ARMS:
            for seed in seeds:
                if (arm[0], dataset, seed) in have:
                    continue
                print(f"[run] {arm[0]}/{dataset}/seed{seed}")
                r = run_one(arm, dataset, seed)
                rows.append(r)
                print("[done]", json.dumps(r))
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                with open(out_path, "w") as f:
                    json.dump(dict(rows=rows), f, indent=1)

    print("\n| arm | dataset | test RMSE (mean±std) | test NLL (mean±std) |")
    print("|---|---|---|---|")
    agg = {}
    for r in rows:
        agg.setdefault((r["arm"], r["dataset"]), []).append(r)
    for (arm, dataset), rs in sorted(agg.items()):
        rm = [r["test_rmse"] for r in rs]
        nl = [r["test_nll"] for r in rs]
        print(f"| {arm} | {dataset} | {np.mean(rm):.4f}±{np.std(rm):.4f} "
              f"| {np.mean(nl):.4f}±{np.std(nl):.4f} |")


if __name__ == "__main__":
    main()
