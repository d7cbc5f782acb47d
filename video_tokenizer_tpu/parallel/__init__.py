from .mesh import (
    MeshConfig,
    create_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
]
