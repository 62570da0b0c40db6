"""Shared experiment plumbing: model/stem/dataset factories + stem pretraining."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from online_gp_tpu.config import SolverConfig
from online_gp_tpu.api import (
    OnlineSKIRegression,
    OnlineSKIClassifier,
    OnlineSVGPRegression,
    OnlineSVGPClassifier,
    OnlineSGPRegression,
    OnlineExactRegression,
    OnlineExactClassifier,
    OnlineLocalGPRegression,
    make_stem,
)
from online_gp_tpu.data import (
    load_uci,
    banana_dataset,
    streaming_friedman,
    svmguide1_dataset,
    criteo_dataset,
)

_REGRESSION_MODELS = {
    "wiski_gp_regression": OnlineSKIRegression,
    "exact_gp_regression": OnlineExactRegression,
    "svgp_regression": OnlineSVGPRegression,
    "sgpr_regression": OnlineSGPRegression,
    "localgp_regression": OnlineLocalGPRegression,
}
_CLASSIFICATION_MODELS = {
    "wiski_gpd": OnlineSKIClassifier,
    "exact_gpd": OnlineExactClassifier,
    "svgp_classification": OnlineSVGPClassifier,
}


def solver_config(cfg: Dict) -> SolverConfig:
    s = cfg.get("solver", {})
    return SolverConfig(
        max_root_decomposition_size=int(s.get("max_root_decomposition_size", 512)),
        max_cholesky_size=int(s.get("max_cholesky_size", 2048)),
        cg_tolerance=float(s.get("cg_tolerance", 1e-2)),
    )


def build_stem(cfg: Dict):
    stem_cfg = dict(cfg["stem"])
    name = stem_cfg.pop("name")
    input_dim = stem_cfg.pop("input_dim")
    feature_dim = stem_cfg.pop("feature_dim", None)
    return make_stem(name, input_dim, feature_dim, **stem_cfg)


def build_model(cfg: Dict, init_x, init_y):
    model_cfg = dict(cfg["model"])
    name = model_cfg.pop("name")
    model_cfg.pop("type", None)
    model_cfg.pop("init_ratio", None)
    stem = build_stem(cfg)
    registry = {**_REGRESSION_MODELS, **_CLASSIFICATION_MODELS}
    cls = registry[name]
    if name in _CLASSIFICATION_MODELS:
        model_cfg.setdefault("num_classes", cfg["dataset"].get("num_classes", 2))
    return cls(stem, init_x, init_y, cfg=solver_config(cfg), seed=cfg["seed"], **model_cfg)


def load_dataset(cfg: Dict):
    d = cfg["dataset"]
    if d["type"] == "classification":
        if d["name"] == "banana":
            return banana_dataset(seed=cfg["seed"])
        if d["name"] == "svmguide1":
            tr_x, tr_y, te_x, te_y, synth = svmguide1_dataset(cfg.get("data_dir"), cfg["seed"])
            if synth:
                print("[data] no local svmguide1 files; using the flagged synthetic surrogate")
            return tr_x, tr_y, te_x, te_y
        if d["name"] == "criteo":
            tr_x, tr_y, te_x, te_y, synth = criteo_dataset(cfg.get("data_dir"), cfg["seed"])
            if synth:
                print("[data] no local criteo files; using the flagged synthetic surrogate")
            return tr_x, tr_y, te_x, te_y
        raise ValueError(f"unknown classification dataset {d['name']}")
    if d["name"] == "friedman":
        return streaming_friedman(
            n=int(d.get("n", 4000)), seed=cfg["seed"], num_dims=d["input_dim"]
        )
    bundle = load_uci(
        d["name"],
        data_dir=cfg.get("data_dir"),
        subsample_ratio=cfg.get("subsample_ratio", 1.0),
        seed=cfg["seed"],
    )
    if bundle.synthetic:
        print(f"[data] no local files for {d['name']!r}; using the flagged synthetic surrogate")
    return bundle.train_x, bundle.train_y, bundle.test_x, bundle.test_y


def pretrain_stem(stem, stem_params, bn_state, x, y, lr=0.1, num_epochs=200, batch_size=256, seed=0, **_):
    """Supervised stem pretraining (reference ``utils/dkl.py:35-58``):
    regress targets from features through a throwaway linear head."""
    x = jnp.asarray(x)
    y = jnp.asarray(y).reshape(x.shape[0], -1)
    head = {
        "w": jnp.zeros((stem.output_dim, y.shape[-1])),
        "b": jnp.zeros((y.shape[-1],)),
    }
    opt = optax.adam(lr)
    opt_state = opt.init((stem_params, head))
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(stem_params, head, bn_state, opt_state, xb, yb):
        def loss_fn(sp_h):
            sp, h = sp_h
            feats, new_bn = stem.apply(sp, bn_state, xb, train=True)
            pred = feats @ h["w"] + h["b"]
            return jnp.mean((pred - yb) ** 2), new_bn

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)((stem_params, head))
        up, opt_state = opt.update(grads, opt_state, (stem_params, head))
        stem_params, head = optax.apply_updates((stem_params, head), up)
        return stem_params, head, new_bn, opt_state, loss

    records = []
    n = x.shape[0]
    bs = min(batch_size, n)
    for epoch in range(num_epochs):
        idx = rng.integers(0, n, bs)
        stem_params, head, bn_state, opt_state, loss = step(
            stem_params, head, bn_state, opt_state, x[idx], y[idx]
        )
        records.append({"epoch": epoch + 1, "loss": float(loss)})
    return stem_params, bn_state, records
