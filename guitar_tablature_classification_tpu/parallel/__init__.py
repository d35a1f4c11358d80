from .mesh import (
    batch_sharding,
    make_mesh,
    maybe_initialize_distributed,
    param_shardings,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "maybe_initialize_distributed",
    "param_shardings",
    "replicated",
    "shard_batch",
]
