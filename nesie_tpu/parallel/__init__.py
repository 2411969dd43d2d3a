from .mesh import (
    data_sharding,
    make_mesh,
    process_local_rows,
    replicate,
    shard_batch,
    shard_host_batch,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "shard_host_batch",
    "replicate",
    "data_sharding",
    "process_local_rows",
]
