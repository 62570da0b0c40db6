"""Multi-seed qNIPV active-learning A/B: WISKI vs exact arm on the
malaria surrogate (VERDICT r3 item 7 'done' criterion: RESULTS AL rows
re-run with the reference-spec priors on BOTH arms, rmse/var
trajectories across >=3 seeds).

Usage:
  python scripts/run_al_campaign.py [out.json] [models=wiski,exact]
      [seeds=3] [steps=25]
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_al_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from online_gp_tpu.bayesopt.active_learning import run_active_learning  # noqa: E402


def main():
    out_path = "al_campaign.json"
    kw = dict(models="wiski,exact", seeds="3", steps="25")
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            kw[k] = v
        else:
            out_path = a

    results = []
    for model_type in kw["models"].split(","):
        for seed in range(int(kw["seeds"])):
            t0 = time.time()
            out = run_active_learning(
                model_type=model_type, num_steps=int(kw["steps"]), seed=seed,
                verbose=False,
            )
            recs = out["records"]
            rec = dict(
                model=model_type, seed=seed,
                first_rmse=round(recs[0]["test_rmse"], 4),
                final_rmse=round(recs[-1]["test_rmse"], 4),
                first_avg_var=round(recs[0]["avg_variance"], 4),
                final_avg_var=round(recs[-1]["avg_variance"], 4),
                rmse_per_step=[round(r["test_rmse"], 4) for r in recs],
                var_per_step=[round(r["avg_variance"], 4) for r in recs],
                wall_s=round(time.time() - t0, 1),
            )
            results.append(rec)
            print(
                f"{model_type:6s} seed {seed}: rmse {rec['first_rmse']:.4f} -> "
                f"{rec['final_rmse']:.4f}, var {rec['first_avg_var']:.4f} -> "
                f"{rec['final_avg_var']:.4f} ({rec['wall_s']}s)",
                flush=True,
            )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)

    import statistics

    for model_type in kw["models"].split(","):
        arm = [r for r in results if r["model"] == model_type]
        if not arm:
            continue
        print(
            f"ARM {model_type}: median final_rmse "
            f"{statistics.median(r['final_rmse'] for r in arm):.4f}, "
            f"median final_avg_var "
            f"{statistics.median(r['final_avg_var'] for r in arm):.4f}"
        )
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
