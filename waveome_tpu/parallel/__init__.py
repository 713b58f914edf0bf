from .distributed import distributed_init
from .mesh import (
    OUTCOME_AXIS,
    outcome_mesh,
    pad_batch,
    process_partition,
    replicate,
    shard_leading_axis,
)

__all__ = [
    "distributed_init",
    "OUTCOME_AXIS",
    "outcome_mesh",
    "pad_batch",
    "process_partition",
    "replicate",
    "shard_leading_axis",
]
