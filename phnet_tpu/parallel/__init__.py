from .mesh import make_mesh, batch_sharding, replicate_sharding, shard_params
from .multihost import global_batch, initialize, is_multihost

__all__ = [
    "make_mesh", "batch_sharding", "replicate_sharding", "shard_params",
    "initialize", "is_multihost", "global_batch",
]
