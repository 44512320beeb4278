from .mesh import (
    DATA_AXIS,
    POINT_AXIS,
    batch_point_sharding,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "POINT_AXIS",
    "batch_point_sharding",
    "batch_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
