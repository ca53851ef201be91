from .sharding import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_params,
    sharded_forward,
    training_step,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_params",
    "sharded_forward",
    "training_step",
]
