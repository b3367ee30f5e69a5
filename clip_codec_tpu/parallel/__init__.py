from .distributed import (
    initialize_distributed,
    replicate_global,
    shard_host_batch_global,
)
from .sample import sample_sharded, sample_spatial_sharded
from .tp import sd_unet_tp_specs, shard_params_tp, validate_tp
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
    "sd_unet_tp_specs",
    "shard_params_tp",
    "validate_tp",
]
