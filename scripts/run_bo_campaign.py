"""Ackley-3d BO campaign: reference-surrogate vs plain-surrogate A/B
(VERDICT r3 item 1 'done' criterion: >=5 seeds, ucb AND ei, RESULTS.md
updated with the A/B).

Usage:
  python scripts/run_bo_campaign.py [out.json] [acqfs=ucb,ei] [seeds=5]
      [surrogates=reference,plain] [steps=30] [dim=3]
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bo_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from online_gp_tpu.bayesopt.loop import run_bayesopt  # noqa: E402


def main():
    out_path = "bo_campaign.json"
    kw = dict(acqfs="ucb,ei", seeds="5", surrogates="reference,plain",
              steps="30", dim="3")
    for a in sys.argv[1:]:
        if "=" in a:
            k, v = a.split("=", 1)
            kw[k] = v
        else:
            out_path = a

    results = []
    for surrogate in kw["surrogates"].split(","):
        for acqf in kw["acqfs"].split(","):
            seeds = kw["seeds"]
            seed_range = (
                range(int(seeds.split(":")[0]), int(seeds.split(":")[1]))
                if ":" in seeds
                else range(int(seeds))
            )
            for seed in seed_range:
                t0 = time.time()
                out = run_bayesopt(
                    function="Ackley", dim=int(kw["dim"]), acqf=acqf,
                    num_steps=int(kw["steps"]), num_init=10, grid_size=10,
                    noise_std=0.1, fit_iters=50, fit_method="adam",
                    surrogate=surrogate, seed=seed, verbose=False,
                )
                rec = dict(
                    surrogate=surrogate, acqf=acqf, seed=seed,
                    best_initial=out["best_per_step"][0],
                    best_final=out["best_per_step"][-1],
                    best_per_step=[round(v, 4) for v in out["best_per_step"]],
                    wall_s=round(time.time() - t0, 1),
                )
                results.append(rec)
                print(
                    f"{surrogate:9s} {acqf:3s} seed {seed}: "
                    f"{rec['best_initial']:8.3f} -> {rec['best_final']:8.3f} "
                    f"({rec['wall_s']}s)",
                    flush=True,
                )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)

    # summary: median best-final per arm
    import statistics

    for surrogate in kw["surrogates"].split(","):
        for acqf in kw["acqfs"].split(","):
            arm = [r for r in results if r["surrogate"] == surrogate and r["acqf"] == acqf]
            if not arm:
                continue
            med = statistics.median(r["best_final"] for r in arm)
            imp = statistics.median(r["best_final"] - r["best_initial"] for r in arm)
            print(f"ARM {surrogate}/{acqf}: median best_final {med:.3f}, "
                  f"median improvement {imp:.3f}")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
