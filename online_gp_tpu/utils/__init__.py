from online_gp_tpu.utils.metrics import batched_rmse_nll, accuracy
from online_gp_tpu.utils.buffers import ReplayBuffer
from online_gp_tpu.utils.checkpoint import save_pytree, load_pytree, save_wrapper, load_wrapper
from online_gp_tpu.utils.random import shuffle_tensors
from online_gp_tpu.utils.plotting import aggregate_trials, read_table

__all__ = [
    "batched_rmse_nll",
    "accuracy",
    "ReplayBuffer",
    "save_pytree",
    "load_pytree",
    "save_wrapper",
    "load_wrapper",
    "shuffle_tensors",
    "aggregate_trials",
    "read_table",
]
