from .distributed import host_shard, init_distributed
from .mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "host_shard",
    "init_distributed",
    "make_mesh",
    "pad_to_multiple",
    "replicated",
    "shard_batch",
    "shard_params",
]
