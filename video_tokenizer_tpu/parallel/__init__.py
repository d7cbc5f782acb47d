from . import pp  # noqa: F401
from . import ring  # noqa: F401
from . import tp  # noqa: F401
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
