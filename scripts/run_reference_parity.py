"""Cross-framework parity harness: online_gp_tpu vs wjmaddox/online_gp.

BASELINE.json's top quality target is RMSE/NLL parity with the reference
on the UCI streaming benchmarks within 1e-4. This image can't check it —
no network for the real UCI files, and gpytorch/botorch aren't installed,
so the reference can't even run here. This script turns that promise into
ONE COMMAND for any machine that has both:

    python scripts/run_reference_parity.py \
        --data-dir /path/to/uci --reference-repo /path/to/online_gp \
        --datasets powerplant,elevators --models wiski,svgp

When gpytorch or the data files are missing it prints SKIPPED (exit 0,
machine-greppable marker) rather than failing, so it is safe in CI.

Two tiers, because "1e-4" is only an honest bar where no optimizer sits
in the loop:

  Tier A (strict, ``--tol``, default 1e-4): conditioning-only streaming.
    Both frameworks get the SAME split (our seeded loader is the single
    source of truth; arrays are handed to torch verbatim), the SAME
    pinned hyperparameters (lengthscale/outputscale/second-noise set
    explicitly on both sides), float64 everywhere, identity stem over
    the first two input columns (so no random stem init can diverge),
    and the stream runs evaluate->condition with update_gp=False /
    update_stem=False. Any RMSE/NLL difference is model math — the
    on-real-data analog of the in-repo f64 oracle parity tests
    (tests/models/test_wiski_parity.py).

  Tier B (loose, ``--loose-tol``, default 0.05): the full reference
    recipe — batch fit, online init + pretrain, prequential stream with
    hyper steps (reference experiments/regression.py:84-150, driven
    through each framework's own task wrapper). torch.Adam and
    optax.adam trajectories cannot match bitwise across frameworks, so
    tier B reports side-by-side final test RMSE/NLL and diffs them at a
    recipe-level tolerance.

Exit codes: 0 = parity (or SKIPPED), 1 = a diff exceeded tolerance.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data-dir", required=False, default=None,
                   help="directory with the real UCI files (xlsx/.mat/npy/csv)")
    p.add_argument("--reference-repo", default="/root/reference",
                   help="checkout of wjmaddox/online_gp (needs gpytorch importable)")
    p.add_argument("--datasets", default="powerplant,elevators")
    p.add_argument("--models", default="wiski,svgp",
                   help="comma list of wiski,svgp,sgpr,exact")
    p.add_argument("--max-stream", type=int, default=500,
                   help="stream-point cap per run (keeps the torch side tractable)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-epochs", type=int, default=50,
                   help="tier-B batch/pretrain epochs")
    p.add_argument("--grid-size", type=int, default=30)
    p.add_argument("--num-inducing", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=1e-4, help="tier-A tolerance")
    p.add_argument("--loose-tol", type=float, default=0.05, help="tier-B tolerance")
    p.add_argument("--tier", default="A,B", help="which tiers to run")
    p.add_argument("--out", default=None, help="optional JSON report path")
    return p.parse_args(argv)


def probe(args):
    """Return (ref_modules, reason): reason is a SKIP string when the
    reference stack or the real data is unavailable."""
    try:
        import torch  # noqa: F401
        import gpytorch  # noqa: F401
    except Exception as e:  # pragma: no cover - vendor path
        return None, f"gpytorch/torch unavailable ({e})"
    if args.reference_repo not in sys.path:
        sys.path.insert(0, args.reference_repo)
    try:
        import online_gp  # noqa: F401
    except Exception as e:
        return None, f"reference package not importable from {args.reference_repo} ({e})"
    if not args.data_dir:
        return None, "no --data-dir with real UCI files given"
    from online_gp_tpu.data.uci import load_uci
    for name in args.datasets.split(","):
        if load_uci(name, data_dir=args.data_dir, seed=args.seed).synthetic:
            return None, f"real data file for {name!r} not found under {args.data_dir}"
    import online_gp as ref
    return ref, None


# ---------------------------------------------------------------- tier A --

def pin_hypers_ours(wrapper, lengthscale, outputscale, second_noise):
    import jax.numpy as jnp
    kernel = wrapper.model.kernel
    kp = dict(wrapper.params["kernel"])
    kp["raw_lengthscale"] = jnp.full_like(
        kp["raw_lengthscale"], kernel.transforms["raw_lengthscale"].inverse(lengthscale))
    kp["raw_outputscale"] = jnp.full_like(
        kp["raw_outputscale"], kernel.transforms["raw_outputscale"].inverse(outputscale))
    wrapper.params = dict(wrapper.params, kernel=kp,
                          raw_second_noise=jnp.full_like(
                              wrapper.params["raw_second_noise"], math.log(second_noise)))
    # re-anchor the streaming state to the pinned hypers
    wrapper.set_train_data(*wrapper._train_data)


def pin_hypers_ref(model, lengthscale, outputscale, second_noise):
    import gpytorch
    gp = getattr(model, "gp", model)
    covar = gp.covar_module
    # unwrap GridInterpolationKernel -> ScaleKernel -> RBFKernel
    scale = covar.base_kernel if hasattr(covar, "base_kernel") and hasattr(
        covar.base_kernel, "base_kernel") else covar
    base = scale.base_kernel
    base.initialize(lengthscale=lengthscale)
    scale.initialize(outputscale=outputscale)
    sn = gp.likelihood.second_noise_covar
    sn.initialize(noise=second_noise)
    return gp


def tier_a(ref, args, dataset):
    """Conditioning-only streaming parity at f64. Returns a result row."""
    import numpy as np
    import torch
    import jax

    jax.config.update("jax_enable_x64", True)
    torch.set_default_dtype(torch.float64)

    from online_gp_tpu.data.uci import load_uci
    from online_gp_tpu.api import OnlineSKIRegression, IdentityStem

    bundle = load_uci(dataset, data_dir=args.data_dir, seed=args.seed)
    # identity stem over the first 2 columns: no stem params -> nothing
    # nondeterministic between frameworks
    tx, ty = bundle.train_x[:, :2].astype(np.float64), bundle.train_y.astype(np.float64)
    ex, ey = bundle.test_x[:, :2].astype(np.float64), bundle.test_y.astype(np.float64)
    n_init = 64
    n_stream = min(args.max_stream, len(tx) - n_init)
    LS, OS, SN = 0.5, 1.0, 0.2

    ours = OnlineSKIRegression(IdentityStem(2), tx[:n_init], ty[:n_init],
                               lr=0.0, grid_size=args.grid_size, grid_bound=1.0)
    pin_hypers_ours(ours, LS, OS, SN)
    o_seq = []
    for i in range(n_init, n_init + n_stream, args.batch_size):
        xb, yb = tx[i:i + args.batch_size], ty[i:i + args.batch_size]
        r, nll = ours.evaluate(xb, yb)
        o_seq.append((float(r), float(nll)))
        ours.update(xb, yb, update_stem=False, update_gp=False)
    o_test = tuple(map(float, ours.evaluate(ex, ey)))

    ref_stem = ref.models.stems.Identity(2)
    theirs = ref.models.OnlineSKIRegression(
        ref_stem, torch.as_tensor(tx[:n_init]), torch.as_tensor(ty[:n_init]),
        lr=0.0, grid_size=args.grid_size, grid_bound=1.0)
    pin_hypers_ref(theirs, LS, OS, SN)
    t_seq = []
    for i in range(n_init, n_init + n_stream, args.batch_size):
        xb = torch.as_tensor(tx[i:i + args.batch_size])
        yb = torch.as_tensor(ty[i:i + args.batch_size])
        r, nll = theirs.evaluate(xb, yb)
        t_seq.append((float(r), float(nll)))
        theirs.update(xb, yb, update_stem=False, update_gp=False)
    t_test = tuple(map(float, theirs.evaluate(torch.as_tensor(ex), torch.as_tensor(ey))))

    preq_rmse_diff = max(abs(a[0] - b[0]) for a, b in zip(o_seq, t_seq))
    preq_nll_diff = max(abs(a[1] - b[1]) for a, b in zip(o_seq, t_seq))
    row = dict(tier="A", dataset=dataset, model="wiski",
               ours_test_rmse=o_test[0], ref_test_rmse=t_test[0],
               ours_test_nll=o_test[1], ref_test_nll=t_test[1],
               max_prequential_rmse_diff=preq_rmse_diff,
               max_prequential_nll_diff=preq_nll_diff,
               test_rmse_diff=abs(o_test[0] - t_test[0]),
               test_nll_diff=abs(o_test[1] - t_test[1]))
    row["pass"] = all(row[k] <= args.tol for k in (
        "max_prequential_rmse_diff", "max_prequential_nll_diff",
        "test_rmse_diff", "test_nll_diff"))
    return row


# ---------------------------------------------------------------- tier B --

def _build_ours(model_name, args, tx, ty):
    from online_gp_tpu.api import (
        OnlineSKIRegression, OnlineSVGPRegression, OnlineSGPRegression,
        OnlineExactRegression, LinearStem, IdentityStem)
    stem = LinearStem(tx.shape[-1], 2)
    if model_name == "wiski":
        return OnlineSKIRegression(stem, tx, ty, lr=0.01, grid_size=args.grid_size,
                                   grid_bound=1.0)
    if model_name == "svgp":
        return OnlineSVGPRegression(IdentityStem(tx.shape[-1]), tx, ty,
                                    num_inducing=args.num_inducing, lr=0.01,
                                    streaming=True)
    if model_name == "sgpr":
        return OnlineSGPRegression(IdentityStem(tx.shape[-1]), tx, ty,
                                   num_inducing=args.num_inducing, lr=0.01)
    if model_name == "exact":
        return OnlineExactRegression(IdentityStem(tx.shape[-1]), tx, ty, lr=0.01)
    raise ValueError(model_name)


def _build_ref(ref, model_name, args, tx, ty):
    import torch
    d = tx.shape[-1]
    if model_name == "wiski":
        stem = ref.models.stems.LinearStem(d, 2)
        return ref.models.OnlineSKIRegression(stem, torch.as_tensor(tx),
                                              torch.as_tensor(ty), lr=0.01,
                                              grid_size=args.grid_size, grid_bound=1.0)
    if model_name == "svgp":
        stem = ref.models.stems.Identity(d)
        return ref.models.OnlineSVGPRegression(
            stem, torch.as_tensor(tx), torch.as_tensor(ty),
            num_inducing=args.num_inducing, lr=0.01, streaming=True,
            beta=1.0, learn_inducing_locations=True, num_update_steps=1)
    if model_name == "sgpr":
        stem = ref.models.stems.Identity(d)
        return ref.models.OnlineSGPRegression(stem, torch.as_tensor(tx),
                                              torch.as_tensor(ty),
                                              num_inducing=args.num_inducing, lr=0.01)
    if model_name == "exact":
        stem = ref.models.stems.Identity(d)
        return ref.models.OnlineExactRegression(stem, torch.as_tensor(tx),
                                                torch.as_tensor(ty), lr=0.01)
    raise ValueError(model_name)


def tier_b(ref, args, dataset, model_name):
    """Full recipe side-by-side (reference experiments/regression.py:84-150)."""
    import numpy as np
    import torch

    from online_gp_tpu.data.uci import load_uci

    bundle = load_uci(dataset, data_dir=args.data_dir, seed=args.seed)
    tx, ty = bundle.train_x, bundle.train_y
    ex, ey = bundle.test_x, bundle.test_y
    n_init = max(64, int(0.1 * len(tx)))
    n_stream = min(args.max_stream, len(tx) - n_init)

    def run(build, update_kw, to_t):
        model = build(tx[:n_init], ty[:n_init])
        model.fit(to_t(tx[:n_init]), to_t(ty[:n_init]), args.num_epochs)
        model.set_lr(gp_lr=0.001, stem_lr=0.0001)
        for i in range(n_init, n_init + n_stream, args.batch_size):
            model.update(to_t(tx[i:i + args.batch_size]),
                         to_t(ty[i:i + args.batch_size]), **update_kw)
        r, nll = model.evaluate(to_t(ex), to_t(ey))
        return float(r), float(nll)

    t0 = time.time()
    ours = run(lambda x, y: _build_ours(model_name, args, x, y), {}, lambda a: a)
    t_ours = time.time() - t0
    t0 = time.time()
    theirs = run(lambda x, y: _build_ref(ref, model_name, args,
                                         np.asarray(x), np.asarray(y)),
                 {}, torch.as_tensor)
    t_ref = time.time() - t0

    row = dict(tier="B", dataset=dataset, model=model_name,
               ours_test_rmse=ours[0], ref_test_rmse=theirs[0],
               ours_test_nll=ours[1], ref_test_nll=theirs[1],
               test_rmse_diff=abs(ours[0] - theirs[0]),
               test_nll_diff=abs(ours[1] - theirs[1]),
               ours_wall_s=round(t_ours, 1), ref_wall_s=round(t_ref, 1))
    row["pass"] = (row["test_rmse_diff"] <= args.loose_tol
                   and row["test_nll_diff"] <= args.loose_tol)
    return row


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    ref, reason = probe(args)
    if ref is None:
        print(f"SKIPPED: {reason}")
        print("(this harness needs gpytorch + the reference repo + real UCI "
              "files; see module docstring)")
        return 0

    rows = []
    tiers = args.tier.split(",")
    for dataset in args.datasets.split(","):
        if "A" in tiers:
            rows.append(tier_a(ref, args, dataset))
            print(json.dumps(rows[-1]))
        if "B" in tiers:
            for model_name in args.models.split(","):
                rows.append(tier_b(ref, args, dataset, model_name))
                print(json.dumps(rows[-1]))

    failed = [r for r in rows if not r["pass"]]
    print(f"\n{len(rows) - len(failed)}/{len(rows)} parity checks passed "
          f"(tier A tol={args.tol}, tier B tol={args.loose_tol})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
