import jax
jax.config.update("jax_platforms", "cpu")
from online_gp_tpu.experiments.config import parse_config
from online_gp_tpu.experiments.regression import regression_trial

base = ["model=svgp_regression", "dataset=powerplant", "stem=linear",
        "num_batch_epochs=100", "max_stream=400", "logging_freq=1000",
        "model.num_inducing=64", "log_dir=/tmp/svgp_sweep2"]
variants = [
    ("nus=8,no-stem-update", ["model.num_update_steps=8", "update_stem=false"]),
    ("nus=8,base_lr=0.2", ["model.num_update_steps=8", "dataset.base_lr=0.2"]),
    ("nus=8,m=128", ["model.num_update_steps=8", "model.num_inducing=128"]),
    ("nus=8,beta0", ["model.num_update_steps=8", "model.online_beta=0.0"]),
]
for name, extra in variants:
    cfg = parse_config(base + extra)
    out = regression_trial(cfg)
    print(f"### {name}: test_rmse={out['test_rmse']:.4f} test_nll={out['test_nll']:.4f}")
