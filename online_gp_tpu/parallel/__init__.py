from online_gp_tpu.parallel.mesh import (
    make_mesh,
    shard_leading,
    replicate,
    batched_trials_step,
    sharded_stream_blocked,
    localgp_experts_step,
)

__all__ = [
    "make_mesh",
    "shard_leading",
    "replicate",
    "batched_trials_step",
    "sharded_stream_blocked",
    "localgp_experts_step",
]
