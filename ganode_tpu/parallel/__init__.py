from .mesh import (
    data_sharding,
    make_mesh,
    make_parallel_step,
    replicate,
    shard_batch,
    shard_batch_seq,
    shard_params_ep,
    shard_params_tp,
)
from .pipeline import pipeline_apply

__all__ = [
    "data_sharding",
    "make_mesh",
    "make_parallel_step",
    "replicate",
    "shard_batch",
    "shard_batch_seq",
    "pipeline_apply",
    "shard_params_ep",
    "shard_params_tp",
]
