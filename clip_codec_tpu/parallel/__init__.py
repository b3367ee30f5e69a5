from .distributed import (
    initialize_distributed,
    replicate_global,
    shard_host_batch_global,
)
from .sample import sample_sharded, sample_spatial_sharded
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharded,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharded",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
    "sample_sharded",
    "sample_spatial_sharded",
    "initialize_distributed",
    "replicate_global",
    "shard_host_batch_global",
]
