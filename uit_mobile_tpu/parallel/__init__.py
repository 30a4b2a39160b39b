from .mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    replicate_tree,
)

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "replicate_tree",
]
