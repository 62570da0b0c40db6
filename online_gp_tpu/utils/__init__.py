from online_gp_tpu.utils.metrics import batched_rmse_nll, accuracy
from online_gp_tpu.utils.buffers import ReplayBuffer

__all__ = ["batched_rmse_nll", "accuracy", "ReplayBuffer"]
