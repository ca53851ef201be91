from .pipeline import pipeline_apply, stage_sharding
from .sharding import (
    DEFAULT_TP_RULES,
    SAM3_TP_RULES,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate,
    shard_params,
    sharded_forward,
    training_step,
)

__all__ = [
    "DEFAULT_TP_RULES",
    "SAM3_TP_RULES",
    "batch_sharding",
    "init_distributed",
    "make_mesh",
    "pipeline_apply",
    "replicate",
    "shard_params",
    "sharded_forward",
    "stage_sharding",
    "training_step",
]
