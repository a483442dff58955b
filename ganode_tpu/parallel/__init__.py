from .mesh import (
    data_sharding,
    make_mesh,
    make_parallel_step,
    replicate,
    shard_batch,
    shard_batch_seq,
    shard_params_tp,
)

__all__ = [
    "data_sharding",
    "make_mesh",
    "make_parallel_step",
    "replicate",
    "shard_batch",
    "shard_batch_seq",
    "shard_params_tp",
]
