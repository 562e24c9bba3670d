from .mesh import (
    active_mesh,
    allgather_host_rows,
    batch_sharding,
    get_mesh,
    replicate,
    set_active_mesh,
    shard_batch,
    shard_local_batch,
)

__all__ = [
    "get_mesh",
    "batch_sharding",
    "shard_batch",
    "shard_local_batch",
    "allgather_host_rows",
    "replicate",
    "active_mesh",
    "set_active_mesh",
]
