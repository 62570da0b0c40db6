"""Multi-trial sweep runner.

The reference farms independent trials as separate processes
(``scripts/launch_jobs.sh``, Hydra submitit launchers — one GPU per
trial; SURVEY.md §2.14). TPU-native analog: either run trials
sequentially in one process (``--mode=seq``, the bash-loop equivalent) or
batch/shard them over the device mesh in ONE jitted program
(``--mode=mesh`` — see :mod:`online_gp_tpu.parallel`), which is the
replacement for a whole Slurm array.

Usage:
    python -m online_gp_tpu.experiments.sweep num_trials=4 mode=seq \
        model=wiski_gp_regression dataset=friedman stem=linear ...
"""

from __future__ import annotations

import sys
from typing import Dict, List

import numpy as np


def run_sweep(num_trials: int, mode: str, overrides: List[str]) -> List[Dict]:
    results = []
    if mode == "seq":
        from online_gp_tpu.experiments.config import parse_config
        from online_gp_tpu.experiments.regression import regression_trial
        from online_gp_tpu.experiments.classification import classification_trial

        for trial in range(num_trials):
            cfg = parse_config(overrides + [f"trial_id={trial}", f"seed={trial}"])
            np.random.seed(trial)
            if cfg["model"]["type"] == "classification":
                results.append(classification_trial(cfg))
            else:
                results.append(regression_trial(cfg))
        return results

    if mode == "mesh":
        from online_gp_tpu.experiments.config import parse_config

        name = parse_config(overrides)["model"]["name"]
        if name == "wiski_gp_regression":
            return mesh_regression_sweep(num_trials, overrides)
        if name == "wiski_gpd":
            return mesh_classification_sweep(num_trials, overrides)
        if name == "svgp_regression":
            return mesh_svgp_sweep(num_trials, overrides)
        if name == "svgp_classification":
            return mesh_svgp_classification_sweep(num_trials, overrides)
        if name == "sgpr_regression":
            return mesh_sgpr_sweep(num_trials, overrides)
        raise ValueError(
            f"mode=mesh supports wiski_gp_regression / wiski_gpd / "
            f"svgp_regression / svgp_classification / sgpr_regression "
            f"(functional vmappable cores); got {name!r} — use mode=seq "
            "for other models"
        )

    raise ValueError(f"unknown sweep mode {mode!r} (seq/mesh)")



def _stack_trial_data(cfg, num_trials: int, y_mode: str):
    """Load ``num_trials`` per-seed datasets and stack along a leading T
    dim (host side), truncating to the shortest trial. ``y_mode`` picks
    the target layout: ``"multi"`` (n, B) f32, ``"single"`` (n, 1) f32,
    ``"labels_i"`` flat int32, ``"labels_f"`` flat f32."""
    import copy as _copy

    from online_gp_tpu.experiments.common import load_dataset

    per_trial = []
    for t in range(num_trials):
        ct = _copy.deepcopy(cfg)
        ct["seed"] = t
        per_trial.append(load_dataset(ct))
    n_tr = min(d[0].shape[0] for d in per_trial)
    n_te = min(d[2].shape[0] for d in per_trial)

    def ys(col, n):
        if y_mode == "multi":
            return [np.asarray(d[col][:n]).reshape(n, -1) for d in per_trial], np.float32
        if y_mode == "single":
            return [np.asarray(d[col][:n]).reshape(n, -1)[:, :1] for d in per_trial], np.float32
        if y_mode == "labels_i":
            return [np.asarray(d[col][:n]).reshape(-1) for d in per_trial], np.int32
        if y_mode == "labels_f":
            return [np.asarray(d[col][:n]).reshape(-1) for d in per_trial], np.float32
        raise ValueError(y_mode)

    train_x = np.stack([np.asarray(d[0][:n_tr]) for d in per_trial]).astype(np.float32)
    rows, dt = ys(1, n_tr)
    train_y = np.stack(rows).astype(dt)
    test_x = np.stack([np.asarray(d[2][:n_te]) for d in per_trial]).astype(np.float32)
    rows, dt = ys(3, n_te)
    test_y = np.stack(rows).astype(dt)
    return train_x, train_y, test_x, test_y


def mesh_regression_sweep(num_trials: int, overrides: List[str]) -> List[Dict]:
    """Run ``num_trials`` independent streaming-regression trials of the
    WISKI flagship as ONE jitted program, vmapped over a leading trial dim
    and sharded over the device mesh — the TPU replacement for the
    reference's Slurm trial array (``scripts/launch_jobs.sh:1-21``,
    submitit launchers).

    Arbitrary model/dataset/stem overrides are honored through the same
    config grammar as ``mode=seq`` (``model=wiski_gp_regression
    dataset=powerplant stem=linear batch_size=1 ...``); per-trial data
    shuffles and stem inits differ by seed. Each trial writes its own
    ``online_metrics`` CSV (reference schema). Deltas vs the sequential
    driver, both forced by the single-program design: no batch-model
    regret arm (batch_rmse/batch_nll/regret are NaN), and BatchNorm
    running stats freeze after the in-program pretrain epochs instead of
    refreshing from a replay buffer each update.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.common import build_stem
    from online_gp_tpu.kernels.base import make_kernel
    from online_gp_tpu.likelihoods.gaussian import gaussian_nll
    from online_gp_tpu.logging import CSVLogger
    from online_gp_tpu.models.partial_mll import sm_partial_mll
    from online_gp_tpu.models.wiski import (
        WiskiModel,
        wiski_condition,
        wiski_init,
        wiski_mll,
        wiski_predict,
    )
    from online_gp_tpu.ops import Grid
    from online_gp_tpu.parallel import make_mesh, shard_leading
    from online_gp_tpu.experiments.common import solver_config

    cfg = parse_config(overrides)
    if cfg["model"]["name"] != "wiski_gp_regression" or cfg["dataset"]["type"] != "regression":
        raise ValueError(
            "mode=mesh batches the functional WISKI regression core; "
            f"got model={cfg['model']['name']!r} dataset type="
            f"{cfg['dataset']['type']!r} — use mode=seq for other models"
        )

    # ---- per-trial data, stacked along a leading T dim (host side) ----
    train_x, train_y, test_x, test_y = _stack_trial_data(cfg, num_trials, "multi")
    n_tr = train_x.shape[1]

    # ---- static model pieces (shared spec; per-trial params) ----
    stem = build_stem(cfg)
    target_dim = train_y.shape[-1]
    grid_bound = cfg["model"].get("grid_bound", 1.0) + 1e-1
    grid = Grid.create([(-grid_bound, grid_bound)] * stem.output_dim, cfg["model"]["grid_size"])
    model = WiskiModel(make_kernel("rbf"), grid, num_outputs=target_dim, learn_additional_noise=True)
    scfg = solver_config(cfg)
    scfg_skip = scfg.replace(skip_logdet_forward=True)

    base_lr = cfg["dataset"]["base_lr"]
    batch_size = cfg["batch_size"]
    num_init = max(int(cfg["model"]["init_ratio"] * n_tr), 2)
    n_stream = n_tr - num_init
    if cfg.get("max_stream"):
        n_stream = min(n_stream, int(cfg["max_stream"]))
    num_chunks = n_stream // batch_size
    if num_chunks == 0:
        raise ValueError(
            f"stream of {n_stream} points is shorter than batch_size="
            f"{batch_size} (after init split / max_stream cap): nothing to "
            "sweep — lower batch_size or raise max_stream"
        )
    num_epochs = cfg["num_batch_epochs"] if cfg["pretrain"] else 0
    update_stem = bool(cfg["update_stem"]) and stem.has_params

    sched = optax.cosine_decay_schedule(base_lr, max(num_epochs, 1), alpha=1e-4 / base_lr)
    pre_gp_opt, pre_stem_opt = optax.adam(sched), optax.adam(sched)
    gp_opt, stem_opt = optax.adam(base_lr / 10), optax.adam(base_lr / 100)

    def one_trial(key, tx, ty, ex, ey):
        init_x, init_y = tx[:num_init], ty[:num_init]
        stream_x = tx[num_init : num_init + num_chunks * batch_size]
        stream_y = ty[num_init : num_init + num_chunks * batch_size]
        xs = stream_x.reshape(num_chunks, batch_size, -1)
        ys = stream_y.reshape(num_chunks, batch_size, target_dim)

        stem_params, bn0 = stem.init(key)
        params = model.init_params(stem.output_dim)
        noise0 = jnp.ones_like(init_y)

        # pretrain epochs: full-cache refit with grads to the stem through
        # the interpolation weights (wrapper ``fit`` semantics)
        def epoch_step(carry, _):
            p, sp, bn, gos, sos = carry

            def loss_fn(pp, spp):
                feats, new_bn = stem.apply(spp, bn, init_x, train=True)
                st = wiski_init(model, feats, init_y, noise0)
                return -jnp.sum(wiski_mll(model, pp, st, scfg)), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, sp)
            g_up, gos = pre_gp_opt.update(grads[0], gos, p)
            p = optax.apply_updates(p, g_up)
            if stem.has_params:
                s_up, sos = pre_stem_opt.update(grads[1], sos, sp)
                sp = optax.apply_updates(sp, s_up)
            return (p, sp, new_bn, gos, sos), loss

        carry = (params, stem_params, bn0, pre_gp_opt.init(params), pre_stem_opt.init(stem_params))
        if num_epochs:
            carry, _ = jax.lax.scan(epoch_step, carry, None, length=num_epochs)
        params, stem_params, bn_state, _, _ = carry

        feats0, _ = stem.apply(stem_params, bn_state, init_x, train=False)
        state = wiski_init(model, jax.lax.stop_gradient(feats0), init_y, noise0)

        # streaming scan: prequential eval -> stem step -> GP step -> condition
        def chunk_step(carry, inp):
            p, sp, st = carry["p"], carry["sp"], carry["st"]
            gos, sos = carry["gos"], carry["sos"]
            x, y = inp
            feats, _ = stem.apply(sp, bn_state, x, train=False)
            feats = jax.lax.stop_gradient(feats)

            mean, var = wiski_predict(model, p, st, feats, scfg)
            s2 = jnp.exp(p["raw_second_noise"])
            var = var + s2[:, None]
            o_rmse = jnp.sqrt(jnp.mean((mean.T - y) ** 2))
            o_nll = jnp.mean(gaussian_nll(mean.T, var.T, y))

            if update_stem:
                def stem_loss_fn(spp):
                    f, _ = stem.apply(spp, bn_state, x, train=False)
                    return -jnp.sum(sm_partial_mll(model, p, st, f, y, scfg))

                s_loss, s_grads = jax.value_and_grad(stem_loss_fn)(sp)
                s_up, sos = stem_opt.update(s_grads, sos, sp)
                sp = optax.apply_updates(sp, s_up)
            else:
                s_loss = jnp.asarray(0.0, jnp.float32)

            g_loss, g_grads = jax.value_and_grad(
                lambda pp: -jnp.sum(wiski_mll(model, pp, st, scfg_skip))
            )(p)
            g_up, gos = gp_opt.update(g_grads, gos, p)
            p = optax.apply_updates(p, g_up)

            st = wiski_condition(model, st, feats, y, jnp.ones_like(y))
            metrics = dict(stem_loss=s_loss, gp_loss=g_loss, online_rmse=o_rmse,
                           online_nll=o_nll, noise=jnp.mean(jnp.exp(p["raw_second_noise"])))
            return dict(p=p, sp=sp, st=st, gos=gos, sos=sos), metrics

        carry = dict(p=params, sp=stem_params, st=state,
                     gos=gp_opt.init(params), sos=stem_opt.init(stem_params))
        carry, metrics = jax.lax.scan(chunk_step, carry, (xs, ys))

        # final held-out evaluation
        fe, _ = stem.apply(carry["sp"], bn_state, ex, train=False)
        mean, var = wiski_predict(model, carry["p"], carry["st"], fe, scfg)
        s2 = jnp.exp(carry["p"]["raw_second_noise"])
        var = var + s2[:, None]
        test_rmse = jnp.sqrt(jnp.mean((mean.T - ey) ** 2))
        test_nll = jnp.mean(gaussian_nll(mean.T, var.T, ey))
        return metrics, test_rmse, test_nll

    # ---- one jitted program over the sharded trial dim ----
    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, min(n_dev, num_trials) + 1) if num_trials % d == 0)
    mesh = make_mesh(mesh_size)
    keys = shard_leading(jax.random.split(jax.random.PRNGKey(cfg["seed"]), num_trials), mesh)
    txs = shard_leading(jnp.asarray(train_x), mesh)
    tys = shard_leading(jnp.asarray(train_y), mesh)
    exs = shard_leading(jnp.asarray(test_x), mesh)
    eys = shard_leading(jnp.asarray(test_y), mesh)

    import time as _time

    t0 = _time.time()
    metrics, test_rmse, test_nll = jax.jit(jax.vmap(one_trial))(keys, txs, tys, exs, eys)
    jax.block_until_ready(test_rmse)
    wall = _time.time() - t0
    step_time = wall / max(num_chunks * num_trials, 1)

    # ---- per-trial CSVs with the reference online_metrics schema ----
    results = []
    freq = max(int(cfg["logging_freq"]), 1)
    metrics = {k: np.asarray(v) for k, v in metrics.items()}
    cum_rmse = np.cumsum(metrics["online_rmse"], axis=1)
    cum_nll = np.cumsum(metrics["online_nll"], axis=1)
    run_tag = f"mesh-{cfg['model']['name']}-{cfg['dataset']['name']}"
    for t in range(num_trials):
        logger = CSVLogger(cfg["log_dir"], f"{run_tag}-trial{t}")
        logger.write_config(cfg)
        logger.add_table("online_metrics")
        log_rows = sorted(set(range(freq - 1, num_chunks, freq)) | {num_chunks - 1})
        for c in log_rows:
            is_last = c == num_chunks - 1
            logger.log(
                dict(
                    stem_loss=float(metrics["stem_loss"][t, c]),
                    gp_loss=float(metrics["gp_loss"][t, c]),
                    batch_rmse=float("nan"),
                    batch_nll=float("nan"),
                    online_rmse=float(cum_rmse[t, c]),
                    online_nll=float(cum_nll[t, c]),
                    regret=float("nan"),
                    test_rmse=float(test_rmse[t]) if is_last else float("nan"),
                    test_nll=float(test_nll[t]) if is_last else float("nan"),
                    noise=float(metrics["noise"][t, c]),
                    step_time=step_time,
                ),
                step=(c + 1) * batch_size,
                table_name="online_metrics",
            )
        logger.write_csv()
        results.append(dict(trial=t, test_rmse=float(test_rmse[t]),
                            test_nll=float(test_nll[t]), log_dir=logger.log_dir))
    return results


def mesh_classification_sweep(num_trials: int, overrides: List[str]) -> List[Dict]:
    """``mode=mesh`` for the Dirichlet WISKI classifier (``wiski_gpd``):
    ``num_trials`` independent streaming-classification trials as ONE
    jitted program, vmapped over the trial dim and sharded over the
    device mesh (VERDICT r2 item 8 — the reference's trial farming is
    model-agnostic, ``scripts/launch_jobs.sh:1-21``).

    Per-trial semantics mirror ``OnlineSKIClassifier``
    (``api/classification.py``): Dirichlet-transformed targets with
    per-class heteroscedastic noise, prequential predict -> stem step on
    ``sm_partial_mll`` -> hyper step on the Woodbury MLL -> condition.
    Same single-program deltas as the regression core: no batch-model
    regret arm, BatchNorm stats frozen after pretrain.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.common import build_stem, solver_config
    from online_gp_tpu.kernels.base import make_kernel
    from online_gp_tpu.likelihoods.dirichlet import dirichlet_transform
    from online_gp_tpu.logging import CSVLogger
    from online_gp_tpu.models.partial_mll import sm_partial_mll
    from online_gp_tpu.models.wiski import (
        WiskiModel,
        wiski_condition,
        wiski_init,
        wiski_mll,
        wiski_predict,
    )
    from online_gp_tpu.ops import Grid
    from online_gp_tpu.parallel import make_mesh, shard_leading

    cfg = parse_config(overrides)
    if cfg["model"]["name"] != "wiski_gpd" or cfg["dataset"]["type"] != "classification":
        raise ValueError(
            "mesh_classification_sweep runs the wiski_gpd core; got "
            f"model={cfg['model']['name']!r} dataset type={cfg['dataset']['type']!r}"
        )

    train_x, train_y, test_x, test_y = _stack_trial_data(cfg, num_trials, "labels_i")
    n_tr = train_x.shape[1]

    stem = build_stem(cfg)
    C = int(cfg["dataset"].get("num_classes", 2))
    alpha_eps = float(cfg["model"].get("alpha_eps", 0.01))
    grid_bound = cfg["model"].get("grid_bound", 1.0) + 1e-1
    grid = Grid.create([(-grid_bound, grid_bound)] * stem.output_dim, cfg["model"]["grid_size"])
    model = WiskiModel(make_kernel("rbf"), grid, num_outputs=C, learn_additional_noise=False)
    scfg = solver_config(cfg)
    scfg_skip = scfg.replace(skip_logdet_forward=True)

    base_lr = cfg["dataset"]["base_lr"]
    batch_size = cfg["batch_size"]
    num_init = max(int(cfg["model"]["init_ratio"] * n_tr), 2)
    n_stream = n_tr - num_init
    if cfg.get("max_stream"):
        n_stream = min(n_stream, int(cfg["max_stream"]))
    num_chunks = n_stream // batch_size
    if num_chunks == 0:
        raise ValueError(
            f"stream of {n_stream} points is shorter than batch_size={batch_size}: "
            "nothing to sweep"
        )
    num_epochs = cfg["num_batch_epochs"] if cfg["pretrain"] else 0
    update_stem = bool(cfg["update_stem"]) and stem.has_params

    sched = optax.cosine_decay_schedule(base_lr, max(num_epochs, 1), alpha=1e-4 / base_lr)
    pre_gp_opt, pre_stem_opt = optax.adam(sched), optax.adam(sched)
    gp_opt, stem_opt = optax.adam(base_lr / 10), optax.adam(base_lr / 100)

    def one_trial(key, tx, ty, ex, ey):
        init_x, init_y = tx[:num_init], ty[:num_init]
        xs = tx[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size, -1)
        ys = ty[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size)

        stem_params, bn0 = stem.init(key)
        params = model.init_params(stem.output_dim)
        t0, _, s0 = dirichlet_transform(init_y, C, alpha_eps)

        def epoch_step(carry, _):
            p, sp, bn, gos, sos = carry

            def loss_fn(pp, spp):
                feats, new_bn = stem.apply(spp, bn, init_x, train=True)
                st = wiski_init(model, feats, t0, s0)
                return -jnp.sum(wiski_mll(model, pp, st, scfg)), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, sp)
            g_up, gos = pre_gp_opt.update(grads[0], gos, p)
            p = optax.apply_updates(p, g_up)
            if stem.has_params:
                s_up, sos = pre_stem_opt.update(grads[1], sos, sp)
                sp = optax.apply_updates(sp, s_up)
            return (p, sp, new_bn, gos, sos), loss

        carry = (params, stem_params, bn0, pre_gp_opt.init(params), pre_stem_opt.init(stem_params))
        if num_epochs:
            carry, _ = jax.lax.scan(epoch_step, carry, None, length=num_epochs)
        params, stem_params, bn_state, _, _ = carry

        feats0, _ = stem.apply(stem_params, bn_state, init_x, train=False)
        state = wiski_init(model, jax.lax.stop_gradient(feats0), t0, s0)

        def chunk_step(carry, inp):
            p, sp, st = carry["p"], carry["sp"], carry["st"]
            gos, sos = carry["gos"], carry["sos"]
            x, lab = inp
            targets, _, sigma2 = dirichlet_transform(lab, C, alpha_eps)
            feats, _ = stem.apply(sp, bn_state, x, train=False)
            feats = jax.lax.stop_gradient(feats)

            mean, _ = wiski_predict(model, p, st, feats, scfg)  # (C, q)
            pred = jnp.argmax(mean, axis=0)
            acc = jnp.mean((pred == lab).astype(jnp.float32))

            if update_stem:
                def stem_loss_fn(spp):
                    f, _ = stem.apply(spp, bn_state, x, train=False)
                    return -jnp.sum(sm_partial_mll(model, p, st, f, targets / sigma2, scfg))

                s_loss, s_grads = jax.value_and_grad(stem_loss_fn)(sp)
                s_up, sos = stem_opt.update(s_grads, sos, sp)
                sp = optax.apply_updates(sp, s_up)
            else:
                s_loss = jnp.asarray(0.0, jnp.float32)

            g_loss, g_grads = jax.value_and_grad(
                lambda pp: -jnp.sum(wiski_mll(model, pp, st, scfg_skip))
            )(p)
            g_up, gos = gp_opt.update(g_grads, gos, p)
            p = optax.apply_updates(p, g_up)

            st = wiski_condition(model, st, feats, targets, sigma2)
            metrics = dict(stem_loss=s_loss, gp_loss=g_loss, online_acc=acc)
            return dict(p=p, sp=sp, st=st, gos=gos, sos=sos), metrics

        carry = dict(p=params, sp=stem_params, st=state,
                     gos=gp_opt.init(params), sos=stem_opt.init(stem_params))
        carry, metrics = jax.lax.scan(chunk_step, carry, (xs, ys))

        fe, _ = stem.apply(carry["sp"], bn_state, ex, train=False)
        mean, _ = wiski_predict(model, carry["p"], carry["st"], fe, scfg)
        test_acc = jnp.mean((jnp.argmax(mean, axis=0) == ey).astype(jnp.float32))
        return metrics, test_acc

    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, min(n_dev, num_trials) + 1) if num_trials % d == 0)
    mesh = make_mesh(mesh_size)
    keys = shard_leading(jax.random.split(jax.random.PRNGKey(cfg["seed"]), num_trials), mesh)
    txs = shard_leading(jnp.asarray(train_x), mesh)
    tys = shard_leading(jnp.asarray(train_y), mesh)
    exs = shard_leading(jnp.asarray(test_x), mesh)
    eys = shard_leading(jnp.asarray(test_y), mesh)

    import time as _time

    t0 = _time.time()
    metrics, test_acc = jax.jit(jax.vmap(one_trial))(keys, txs, tys, exs, eys)
    jax.block_until_ready(test_acc)
    step_time = (_time.time() - t0) / max(num_chunks * num_trials, 1)

    results = []
    freq = max(int(cfg["logging_freq"]), 1)
    metrics = {k: np.asarray(v) for k, v in metrics.items()}
    # running mean of per-chunk accuracy = cumulative online accuracy
    cum_acc = np.cumsum(metrics["online_acc"], axis=1) / np.arange(1, num_chunks + 1)
    run_tag = f"mesh-{cfg['model']['name']}-{cfg['dataset']['name']}"
    for t in range(num_trials):
        logger = CSVLogger(cfg["log_dir"], f"{run_tag}-trial{t}")
        logger.write_config(cfg)
        logger.add_table("online_metrics")
        log_rows = sorted(set(range(freq - 1, num_chunks, freq)) | {num_chunks - 1})
        for c in log_rows:
            is_last = c == num_chunks - 1
            logger.log(
                dict(
                    stem_loss=float(metrics["stem_loss"][t, c]),
                    gp_loss=float(metrics["gp_loss"][t, c]),
                    online_acc=float(cum_acc[t, c]),
                    batch_acc=float("nan"),
                    regret=float("nan"),
                    test_acc=float(test_acc[t]) if is_last else float("nan"),
                    step_time=step_time,
                ),
                step=(c + 1) * batch_size,
                table_name="online_metrics",
            )
        logger.write_csv()
        results.append(dict(trial=t, test_acc=float(test_acc[t]), log_dir=logger.log_dir))
    return results


def mesh_svgp_sweep(num_trials: int, overrides: List[str]) -> List[Dict]:
    """``mode=mesh`` for streaming O-SVGP regression: ``num_trials``
    independent trials as ONE vmapped+sharded jitted program (VERDICT r2
    item 8).

    Per-trial semantics mirror ``OnlineSVGPRegression``
    (``api/svgp.py``): per-trial inducing inits, full-init-batch ELBO
    pretrain epochs with beta=1, then per chunk — prequential evaluate ->
    snapshot the old variational/prior dists -> ``num_update_steps`` ELBO
    steps with beta=prior_beta and the Bui streaming KL correction at
    online_beta. Single-program deltas: BatchNorm stats frozen after
    pretrain, no 1024-point replay padding for lone-point updates (the
    stream is chunked instead).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.common import build_stem, solver_config
    from online_gp_tpu.kernels.base import make_kernel
    from online_gp_tpu.likelihoods.gaussian import gaussian_nll
    from online_gp_tpu.logging import CSVLogger
    from online_gp_tpu.models.svgp import (
        SVGPModel,
        svgp_elbo,
        svgp_init_variational_to_prior,
        svgp_predict,
        svgp_snapshot,
        svgp_streaming_correction,
    )
    from online_gp_tpu.api.svgp import _make_optimizer
    from online_gp_tpu.parallel import make_mesh, shard_leading

    cfg = parse_config(overrides)
    if cfg["model"]["name"] != "svgp_regression" or cfg["dataset"]["type"] != "regression":
        raise ValueError(
            "mesh_svgp_sweep runs the svgp_regression core; got "
            f"model={cfg['model']['name']!r} dataset type={cfg['dataset']['type']!r}"
        )

    train_x, train_y, test_x, test_y = _stack_trial_data(cfg, num_trials, "single")
    n_tr = train_x.shape[1]

    stem = build_stem(cfg)
    model = SVGPModel(make_kernel("rbf"), likelihood="gaussian")
    scfg = solver_config(cfg)

    base_lr = cfg["dataset"]["base_lr"]
    batch_size = cfg["batch_size"]
    num_inducing = int(cfg["model"]["num_inducing"])
    prior_beta = float(cfg["model"]["prior_beta"])
    online_beta = float(cfg["model"]["online_beta"])
    num_update_steps = int(cfg["model"]["num_update_steps"] or batch_size)
    streaming = bool(cfg["model"].get("streaming", True))
    num_init = max(int(cfg["model"]["init_ratio"] * n_tr), 2)
    n_stream = n_tr - num_init
    if cfg.get("max_stream"):
        n_stream = min(n_stream, int(cfg["max_stream"]))
    num_chunks = n_stream // batch_size
    if num_chunks == 0:
        raise ValueError(
            f"stream of {n_stream} points is shorter than batch_size={batch_size}: "
            "nothing to sweep"
        )
    num_epochs = cfg["num_batch_epochs"] if cfg["pretrain"] else 0

    opt = _make_optimizer(base_lr)
    stem_opt = optax.adam(base_lr / 10.0)

    def one_trial(key, tx, ty, ex, ey):
        init_x, init_y = tx[:num_init], ty[:num_init]
        xs = tx[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size, -1)
        ys = ty[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size, 1)

        k_stem, k_z = jax.random.split(key)
        stem_params, bn0 = stem.init(k_stem)
        z = jax.random.uniform(k_z, (num_inducing, stem.output_dim), minval=-1.0, maxval=1.0)
        params = svgp_init_variational_to_prior(model, model.init_params(z, stem.output_dim))

        def epoch_step(carry, _):
            p, sp, bn, os_, sos = carry

            def loss_fn(pp, spp):
                feats, new_bn = stem.apply(spp, bn, init_x, train=True)
                return -svgp_elbo(model, pp, feats, init_y, num_init, 1.0, scfg), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, sp)
            up, os_ = opt.update(grads[0], os_, p)
            p = optax.apply_updates(p, up)
            if stem.has_params:
                sup, sos = stem_opt.update(grads[1], sos, sp)
                sp = optax.apply_updates(sp, sup)
            return (p, sp, new_bn, os_, sos), loss

        carry = (params, stem_params, bn0, opt.init(params), stem_opt.init(stem_params))
        if num_epochs:
            carry, _ = jax.lax.scan(epoch_step, carry, None, length=num_epochs)
        params, stem_params, bn_state, opt_state, stem_os = carry

        def chunk_step(carry, inp):
            p, sp, os_, sos = carry["p"], carry["sp"], carry["os"], carry["sos"]
            x, y = inp
            feats, _ = stem.apply(sp, bn_state, x, train=False)
            feats = jax.lax.stop_gradient(feats)

            mean, var = svgp_predict(model, p, feats, scfg)
            var = var + jnp.exp(p["raw_noise"])
            o_rmse = jnp.sqrt(jnp.mean((mean[:, None] - y) ** 2))
            o_nll = jnp.mean(gaussian_nll(mean[:, None], var[:, None], y))

            old = svgp_snapshot(model, p)

            def update_once(carry2, _):
                p2, sp2, os2, sos2 = carry2

                def loss_fn(pp, spp):
                    f, _ = stem.apply(spp, bn_state, x, train=False)
                    loss = -svgp_elbo(model, pp, f, y, batch_size, prior_beta, scfg)
                    if streaming:
                        loss = loss + svgp_streaming_correction(
                            model, pp, old, batch_size, online_beta, scfg
                        )
                    return loss

                loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p2, sp2)
                up, os2 = opt.update(grads[0], os2, p2)
                p2 = optax.apply_updates(p2, up)
                if stem.has_params:
                    sup, sos2 = stem_opt.update(grads[1], sos2, sp2)
                    sp2 = optax.apply_updates(sp2, sup)
                return (p2, sp2, os2, sos2), loss

            (p, sp, os_, sos), losses = jax.lax.scan(
                update_once, (p, sp, os_, sos), None, length=num_update_steps
            )
            metrics = dict(gp_loss=losses[-1], online_rmse=o_rmse, online_nll=o_nll,
                           noise=jnp.exp(p["raw_noise"]))
            return dict(p=p, sp=sp, os=os_, sos=sos), metrics

        carry = dict(p=params, sp=stem_params, os=opt_state, sos=stem_os)
        carry, metrics = jax.lax.scan(chunk_step, carry, (xs, ys))

        fe, _ = stem.apply(carry["sp"], bn_state, ex, train=False)
        mean, var = svgp_predict(model, carry["p"], fe, scfg)
        var = var + jnp.exp(carry["p"]["raw_noise"])
        test_rmse = jnp.sqrt(jnp.mean((mean[:, None] - ey) ** 2))
        test_nll = jnp.mean(gaussian_nll(mean[:, None], var[:, None], ey))
        return metrics, test_rmse, test_nll

    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, min(n_dev, num_trials) + 1) if num_trials % d == 0)
    mesh = make_mesh(mesh_size)
    keys = shard_leading(jax.random.split(jax.random.PRNGKey(cfg["seed"]), num_trials), mesh)
    txs = shard_leading(jnp.asarray(train_x), mesh)
    tys = shard_leading(jnp.asarray(train_y), mesh)
    exs = shard_leading(jnp.asarray(test_x), mesh)
    eys = shard_leading(jnp.asarray(test_y), mesh)

    import time as _time

    t0 = _time.time()
    metrics, test_rmse, test_nll = jax.jit(jax.vmap(one_trial))(keys, txs, tys, exs, eys)
    jax.block_until_ready(test_rmse)
    step_time = (_time.time() - t0) / max(num_chunks * num_trials, 1)

    results = []
    freq = max(int(cfg["logging_freq"]), 1)
    metrics = {k: np.asarray(v) for k, v in metrics.items()}
    cum_rmse = np.cumsum(metrics["online_rmse"], axis=1)
    cum_nll = np.cumsum(metrics["online_nll"], axis=1)
    run_tag = f"mesh-{cfg['model']['name']}-{cfg['dataset']['name']}"
    for t in range(num_trials):
        logger = CSVLogger(cfg["log_dir"], f"{run_tag}-trial{t}")
        logger.write_config(cfg)
        logger.add_table("online_metrics")
        log_rows = sorted(set(range(freq - 1, num_chunks, freq)) | {num_chunks - 1})
        for c in log_rows:
            is_last = c == num_chunks - 1
            logger.log(
                dict(
                    stem_loss=float("nan"),
                    gp_loss=float(metrics["gp_loss"][t, c]),
                    batch_rmse=float("nan"),
                    batch_nll=float("nan"),
                    online_rmse=float(cum_rmse[t, c]),
                    online_nll=float(cum_nll[t, c]),
                    regret=float("nan"),
                    test_rmse=float(test_rmse[t]) if is_last else float("nan"),
                    test_nll=float(test_nll[t]) if is_last else float("nan"),
                    noise=float(metrics["noise"][t, c]),
                    step_time=step_time,
                ),
                step=(c + 1) * batch_size,
                table_name="online_metrics",
            )
        logger.write_csv()
        results.append(dict(trial=t, test_rmse=float(test_rmse[t]),
                            test_nll=float(test_nll[t]), log_dir=logger.log_dir))
    return results


def mesh_svgp_classification_sweep(num_trials: int, overrides: List[str]) -> List[Dict]:
    """``mode=mesh`` for the streaming probit O-SVGP classifier: trials
    vmapped+sharded as one program, mirroring ``OnlineSVGPClassifier``
    (``api/svgp.py``): bernoulli-probit ELBO (32-node GH quadrature),
    per-chunk snapshot + streaming-corrected update steps, p >= 0.5
    decisions. Labels enter the ELBO in {0, 1} (the likelihood maps them
    to ±1 internally)."""
    import jax
    import jax.numpy as jnp
    import optax

    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.common import build_stem, solver_config
    from online_gp_tpu.kernels.base import make_kernel
    from online_gp_tpu.likelihoods.bernoulli import bernoulli_probit_predictive
    from online_gp_tpu.logging import CSVLogger
    from online_gp_tpu.models.svgp import (
        SVGPModel,
        svgp_elbo,
        svgp_init_variational_to_prior,
        svgp_predict,
        svgp_snapshot,
        svgp_streaming_correction,
    )
    from online_gp_tpu.api.svgp import _make_optimizer
    from online_gp_tpu.parallel import make_mesh, shard_leading

    cfg = parse_config(overrides)
    if cfg["model"]["name"] != "svgp_classification" or cfg["dataset"]["type"] != "classification":
        raise ValueError(
            "mesh_svgp_classification_sweep runs the svgp_classification core; got "
            f"model={cfg['model']['name']!r} dataset type={cfg['dataset']['type']!r}"
        )

    train_x, train_y, test_x, test_y = _stack_trial_data(cfg, num_trials, "labels_f")
    n_tr = train_x.shape[1]
    test_y = test_y.astype(np.int32)

    stem = build_stem(cfg)
    model = SVGPModel(make_kernel("rbf"), likelihood="bernoulli")
    scfg = solver_config(cfg)

    base_lr = cfg["dataset"]["base_lr"]
    batch_size = cfg["batch_size"]
    num_inducing = int(cfg["model"]["num_inducing"])
    prior_beta = float(cfg["model"]["prior_beta"])
    online_beta = float(cfg["model"]["online_beta"])
    num_update_steps = int(cfg["model"]["num_update_steps"] or batch_size)
    streaming = bool(cfg["model"].get("streaming", True))
    num_init = max(int(cfg["model"]["init_ratio"] * n_tr), 2)
    n_stream = n_tr - num_init
    if cfg.get("max_stream"):
        n_stream = min(n_stream, int(cfg["max_stream"]))
    num_chunks = n_stream // batch_size
    if num_chunks == 0:
        raise ValueError(
            f"stream of {n_stream} points is shorter than batch_size={batch_size}: "
            "nothing to sweep"
        )
    num_epochs = cfg["num_batch_epochs"] if cfg["pretrain"] else 0

    opt = _make_optimizer(base_lr)
    stem_opt = optax.adam(base_lr / 10.0)

    def one_trial(key, tx, ty, ex, ey):
        init_x, init_y = tx[:num_init], ty[:num_init]
        xs = tx[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size, -1)
        ys = ty[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size)

        k_stem, k_z = jax.random.split(key)
        stem_params, bn0 = stem.init(k_stem)
        z = jax.random.uniform(k_z, (num_inducing, stem.output_dim), minval=-1.0, maxval=1.0)
        params = svgp_init_variational_to_prior(model, model.init_params(z, stem.output_dim))

        def epoch_step(carry, _):
            p, sp, bn, os_, sos = carry

            def loss_fn(pp, spp):
                feats, new_bn = stem.apply(spp, bn, init_x, train=True)
                return -svgp_elbo(model, pp, feats, init_y, num_init, 1.0, scfg), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, sp)
            up, os_ = opt.update(grads[0], os_, p)
            p = optax.apply_updates(p, up)
            if stem.has_params:
                sup, sos = stem_opt.update(grads[1], sos, sp)
                sp = optax.apply_updates(sp, sup)
            return (p, sp, new_bn, os_, sos), loss

        carry = (params, stem_params, bn0, opt.init(params), stem_opt.init(stem_params))
        if num_epochs:
            carry, _ = jax.lax.scan(epoch_step, carry, None, length=num_epochs)
        params, stem_params, bn_state, opt_state, stem_os = carry

        def chunk_step(carry, inp):
            p, sp, os_, sos = carry["p"], carry["sp"], carry["os"], carry["sos"]
            x, y = inp
            feats = jax.lax.stop_gradient(stem.apply(sp, bn_state, x, train=False)[0])

            mean, var = svgp_predict(model, p, feats, scfg)
            prob = bernoulli_probit_predictive(mean, var)
            acc = jnp.mean(((prob >= 0.5).astype(jnp.float32) == y).astype(jnp.float32))

            old = svgp_snapshot(model, p)

            def update_once(carry2, _):
                p2, sp2, os2, sos2 = carry2

                def loss_fn(pp, spp):
                    f, _ = stem.apply(spp, bn_state, x, train=False)
                    loss = -svgp_elbo(model, pp, f, y, batch_size, prior_beta, scfg)
                    if streaming:
                        loss = loss + svgp_streaming_correction(
                            model, pp, old, batch_size, online_beta, scfg
                        )
                    return loss

                loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p2, sp2)
                up, os2 = opt.update(grads[0], os2, p2)
                p2 = optax.apply_updates(p2, up)
                if stem.has_params:
                    sup, sos2 = stem_opt.update(grads[1], sos2, sp2)
                    sp2 = optax.apply_updates(sp2, sup)
                return (p2, sp2, os2, sos2), loss

            (p, sp, os_, sos), losses = jax.lax.scan(
                update_once, (p, sp, os_, sos), None, length=num_update_steps
            )
            metrics = dict(gp_loss=losses[-1], online_acc=acc)
            return dict(p=p, sp=sp, os=os_, sos=sos), metrics

        carry = dict(p=params, sp=stem_params, os=opt_state, sos=stem_os)
        carry, metrics = jax.lax.scan(chunk_step, carry, (xs, ys))

        fe, _ = stem.apply(carry["sp"], bn_state, ex, train=False)
        mean, var = svgp_predict(model, carry["p"], fe, scfg)
        pred = (bernoulli_probit_predictive(mean, var) >= 0.5).astype(jnp.int32)
        test_acc = jnp.mean((pred == ey).astype(jnp.float32))
        return metrics, test_acc

    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, min(n_dev, num_trials) + 1) if num_trials % d == 0)
    mesh = make_mesh(mesh_size)
    keys = shard_leading(jax.random.split(jax.random.PRNGKey(cfg["seed"]), num_trials), mesh)
    txs = shard_leading(jnp.asarray(train_x), mesh)
    tys = shard_leading(jnp.asarray(train_y), mesh)
    exs = shard_leading(jnp.asarray(test_x), mesh)
    eys = shard_leading(jnp.asarray(test_y), mesh)

    import time as _time

    t0 = _time.time()
    metrics, test_acc = jax.jit(jax.vmap(one_trial))(keys, txs, tys, exs, eys)
    jax.block_until_ready(test_acc)
    step_time = (_time.time() - t0) / max(num_chunks * num_trials, 1)

    results = []
    freq = max(int(cfg["logging_freq"]), 1)
    metrics = {k: np.asarray(v) for k, v in metrics.items()}
    cum_acc = np.cumsum(metrics["online_acc"], axis=1) / np.arange(1, num_chunks + 1)
    run_tag = f"mesh-{cfg['model']['name']}-{cfg['dataset']['name']}"
    for t in range(num_trials):
        logger = CSVLogger(cfg["log_dir"], f"{run_tag}-trial{t}")
        logger.write_config(cfg)
        logger.add_table("online_metrics")
        log_rows = sorted(set(range(freq - 1, num_chunks, freq)) | {num_chunks - 1})
        for c in log_rows:
            is_last = c == num_chunks - 1
            logger.log(
                dict(
                    stem_loss=float("nan"),
                    gp_loss=float(metrics["gp_loss"][t, c]),
                    online_acc=float(cum_acc[t, c]),
                    batch_acc=float("nan"),
                    regret=float("nan"),
                    test_acc=float(test_acc[t]) if is_last else float("nan"),
                    step_time=step_time,
                ),
                step=(c + 1) * batch_size,
                table_name="online_metrics",
            )
        logger.write_csv()
        results.append(dict(trial=t, test_acc=float(test_acc[t]), log_dir=logger.log_dir))
    return results


def mesh_sgpr_sweep(num_trials: int, overrides: List[str]) -> List[Dict]:
    """``mode=mesh`` for streaming O-SGPR regression: ``num_trials``
    independent trials as ONE vmapped+sharded jitted program.

    Per-trial semantics mirror ``OnlineSGPRegression``
    (``api/sgpr_regression.py``): collapsed-bound pretrain epochs on the
    init batch, an initial absorb, then per chunk — prequential evaluate
    -> (every ``rebase_every``-th chunk) ``num_update_steps`` bound-grad
    steps THEN a rebasing absorb; other chunks exact-accumulate the
    information summary with frozen hypers (zero projection leakage).
    The hyper/rebase coupling runs as ``lax.cond`` branches inside the
    scan. Single-program deltas: BatchNorm stats frozen after pretrain,
    no replay padding, no z-resampling.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from online_gp_tpu.experiments.config import parse_config
    from online_gp_tpu.experiments.common import build_stem
    from online_gp_tpu.kernels.base import make_kernel
    from online_gp_tpu.likelihoods.gaussian import gaussian_nll
    from online_gp_tpu.logging import CSVLogger
    from online_gp_tpu.models.sgpr import (
        SGPRModel,
        sgpr_absorb,
        sgpr_bound,
        sgpr_predict,
    )
    from online_gp_tpu.api.sgpr_regression import _sgpr_optimizer
    from online_gp_tpu.parallel import make_mesh, shard_leading

    cfg = parse_config(overrides)
    if cfg["model"]["name"] != "sgpr_regression" or cfg["dataset"]["type"] != "regression":
        raise ValueError(
            "mesh_sgpr_sweep runs the sgpr_regression core; got "
            f"model={cfg['model']['name']!r} dataset type={cfg['dataset']['type']!r}"
        )

    train_x, train_y, test_x, test_y = _stack_trial_data(cfg, num_trials, "single")
    n_tr = train_x.shape[1]

    stem = build_stem(cfg)
    model = SGPRModel(make_kernel("rbf"), jitter=float(cfg["model"].get("jitter", 1e-4)))

    base_lr = cfg["dataset"]["base_lr"]
    batch_size = cfg["batch_size"]
    num_inducing = int(cfg["model"]["num_inducing"])
    num_update_steps = int(cfg["model"].get("num_update_steps") or 1)
    rebase_every = max(1, int(cfg["model"].get("rebase_every", 25)))
    num_init = max(int(cfg["model"]["init_ratio"] * n_tr), 2)
    n_stream = n_tr - num_init
    if cfg.get("max_stream"):
        n_stream = min(n_stream, int(cfg["max_stream"]))
    num_chunks = n_stream // batch_size
    if num_chunks == 0:
        raise ValueError(
            f"stream of {n_stream} points is shorter than batch_size={batch_size}: "
            "nothing to sweep"
        )
    num_epochs = cfg["num_batch_epochs"] if cfg["pretrain"] else 0

    # wrapper conventions: fit phase at reference per-group LRs, streaming
    # phase at (lr, lr/10) for (hypers, z)
    fit_opt = _sgpr_optimizer(1e-1, 1e-2)
    fit_stem_opt = optax.adam(1e-2)
    opt = _sgpr_optimizer(base_lr, base_lr / 10.0)
    stem_opt = optax.adam(base_lr / 10.0)

    def one_trial(key, tx, ty, ex, ey):
        init_x, init_y = tx[:num_init], ty[:num_init, 0]
        xs = tx[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size, -1)
        ys = ty[num_init : num_init + num_chunks * batch_size].reshape(num_chunks, batch_size)

        k_stem, k_z = jax.random.split(key)
        stem_params, bn0 = stem.init(k_stem)
        z = jax.random.uniform(k_z, (num_inducing, stem.output_dim), minval=-1.0, maxval=1.0)
        params = model.init_params(z, stem.output_dim)

        def epoch_step(carry, _):
            p, sp, bn, os_, sos = carry

            def loss_fn(pp, spp):
                feats, new_bn = stem.apply(spp, bn, init_x, train=True)
                return -sgpr_bound(model, pp, None, feats, init_y, combine_terms=True), new_bn

            (loss, new_bn), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, sp)
            up, os_ = fit_opt.update(grads[0], os_, p)
            p = optax.apply_updates(p, up)
            if stem.has_params:
                sup, sos = fit_stem_opt.update(grads[1], sos, sp)
                sp = optax.apply_updates(sp, sup)
            return (p, sp, new_bn, os_, sos), loss

        carry = (params, stem_params, bn0, fit_opt.init(params), fit_stem_opt.init(stem_params))
        if num_epochs:
            carry, _ = jax.lax.scan(epoch_step, carry, None, length=num_epochs)
        params, stem_params, bn_state, _, _ = carry

        feats0, _ = stem.apply(stem_params, bn_state, init_x, train=False)
        feats0 = jax.lax.stop_gradient(feats0)
        params, old, moments = sgpr_absorb(model, params, None, None, feats0, init_y)

        def chunk_step(carry, inp):
            p, sp, old, moments = carry["p"], carry["sp"], carry["old"], carry["mom"]
            os_, sos = carry["os"], carry["sos"]
            i, x, y = inp
            feats = jax.lax.stop_gradient(stem.apply(sp, bn_state, x, train=False)[0])

            mean, var = sgpr_predict(model, p, moments, feats)
            var = var + jnp.exp(p["raw_noise"])
            o_rmse = jnp.sqrt(jnp.mean((mean[:, None] - y[:, None]) ** 2))
            o_nll = jnp.mean(gaussian_nll(mean[:, None], var[:, None], y[:, None]))

            do_hyper = jnp.logical_and(
                (i + 1) % rebase_every == 0, num_update_steps > 0
            )

            def with_hyper(args):
                p2, sp2, os2, sos2 = args

                def one(carry2, _):
                    p3, sp3, os3, sos3 = carry2

                    def loss_fn(pp, spp):
                        f, _ = stem.apply(spp, bn_state, x, train=False)
                        logp, trace, _, _ = sgpr_bound(
                            model, pp, old, f, y, combine_terms=False
                        )
                        return -(logp + trace)

                    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(p3, sp3)
                    up, os3 = opt.update(grads[0], os3, p3)
                    p3 = optax.apply_updates(p3, up)
                    if stem.has_params:
                        sup, sos3 = stem_opt.update(grads[1], sos3, sp3)
                        sp3 = optax.apply_updates(sp3, sup)
                    return (p3, sp3, os3, sos3), loss

                (p2, sp2, os2, sos2), losses = jax.lax.scan(
                    one, (p2, sp2, os2, sos2), None, length=num_update_steps
                )
                return p2, sp2, os2, sos2, losses[-1]

            def no_hyper(args):
                p2, sp2, os2, sos2 = args
                return p2, sp2, os2, sos2, jnp.asarray(jnp.nan, x.dtype)

            p, sp, os_, sos, loss = jax.lax.cond(
                do_hyper, with_hyper, no_hyper, (p, sp, os_, sos)
            )

            feats2 = jax.lax.stop_gradient(stem.apply(sp, bn_state, x, train=False)[0])
            p, old, moments = jax.lax.cond(
                do_hyper,
                lambda a: sgpr_absorb(model, a[0], a[1], None, feats2, y, rebase=True),
                lambda a: sgpr_absorb(model, a[0], a[1], None, feats2, y, rebase=False),
                (p, old),
            )

            metrics = dict(gp_loss=loss, online_rmse=o_rmse, online_nll=o_nll,
                           noise=jnp.exp(p["raw_noise"]))
            return dict(p=p, sp=sp, old=old, mom=moments, os=os_, sos=sos), metrics

        carry = dict(p=params, sp=stem_params, old=old, mom=moments,
                     os=opt.init(params), sos=stem_opt.init(stem_params))
        carry, metrics = jax.lax.scan(
            chunk_step, carry, (jnp.arange(num_chunks), xs, ys)
        )

        fe, _ = stem.apply(carry["sp"], bn_state, ex, train=False)
        mean, var = sgpr_predict(model, carry["p"], carry["mom"], fe)
        var = var + jnp.exp(carry["p"]["raw_noise"])
        test_rmse = jnp.sqrt(jnp.mean((mean[:, None] - ey) ** 2))
        test_nll = jnp.mean(gaussian_nll(mean[:, None], var[:, None], ey))
        return metrics, test_rmse, test_nll

    n_dev = len(jax.devices())
    mesh_size = max(d for d in range(1, min(n_dev, num_trials) + 1) if num_trials % d == 0)
    mesh = make_mesh(mesh_size)
    keys = shard_leading(jax.random.split(jax.random.PRNGKey(cfg["seed"]), num_trials), mesh)
    txs = shard_leading(jnp.asarray(train_x), mesh)
    tys = shard_leading(jnp.asarray(train_y), mesh)
    exs = shard_leading(jnp.asarray(test_x), mesh)
    eys = shard_leading(jnp.asarray(test_y), mesh)

    import time as _time

    t0 = _time.time()
    metrics, test_rmse, test_nll = jax.jit(jax.vmap(one_trial))(keys, txs, tys, exs, eys)
    jax.block_until_ready(test_rmse)
    step_time = (_time.time() - t0) / max(num_chunks * num_trials, 1)

    results = []
    freq = max(int(cfg["logging_freq"]), 1)
    metrics = {k: np.asarray(v) for k, v in metrics.items()}
    cum_rmse = np.cumsum(metrics["online_rmse"], axis=1)
    cum_nll = np.cumsum(metrics["online_nll"], axis=1)
    run_tag = f"mesh-{cfg['model']['name']}-{cfg['dataset']['name']}"
    for t in range(num_trials):
        logger = CSVLogger(cfg["log_dir"], f"{run_tag}-trial{t}")
        logger.write_config(cfg)
        logger.add_table("online_metrics")
        log_rows = sorted(set(range(freq - 1, num_chunks, freq)) | {num_chunks - 1})
        for c in log_rows:
            is_last = c == num_chunks - 1
            logger.log(
                dict(
                    stem_loss=float("nan"),
                    gp_loss=float(metrics["gp_loss"][t, c]),
                    batch_rmse=float("nan"),
                    batch_nll=float("nan"),
                    online_rmse=float(cum_rmse[t, c]),
                    online_nll=float(cum_nll[t, c]),
                    regret=float("nan"),
                    test_rmse=float(test_rmse[t]) if is_last else float("nan"),
                    test_nll=float(test_nll[t]) if is_last else float("nan"),
                    noise=float(metrics["noise"][t, c]),
                    step_time=step_time,
                ),
                step=(c + 1) * batch_size,
                table_name="online_metrics",
            )
        logger.write_csv()
        results.append(dict(trial=t, test_rmse=float(test_rmse[t]),
                            test_nll=float(test_nll[t]), log_dir=logger.log_dir))
    return results


def main():
    args = sys.argv[1:]
    num_trials, mode, overrides = 2, "seq", []
    for a in args:
        k, v = a.split("=", 1)
        if k == "num_trials":
            num_trials = int(v)
        elif k == "mode":
            mode = v
        else:
            overrides.append(a)
    results = run_sweep(num_trials, mode, overrides)
    for r in results:
        print(r)


if __name__ == "__main__":
    main()
