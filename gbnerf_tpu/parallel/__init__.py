from .mesh import (make_mesh, data_sharding, replicated, shard_batch,
                   replicate, constrain_data, pad_to_multiple)

__all__ = [
    "make_mesh", "data_sharding", "replicated", "shard_batch", "replicate",
    "constrain_data", "pad_to_multiple",
]
