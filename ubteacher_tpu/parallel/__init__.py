from .mesh import (
    active_mesh,
    batch_sharding,
    get_mesh,
    replicate,
    set_active_mesh,
    shard_batch,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "active_mesh",
    "set_active_mesh",
]
