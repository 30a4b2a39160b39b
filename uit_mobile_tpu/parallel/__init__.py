from .mesh import (
    make_mesh,
    replicated,
    batch_sharded,
    shard_batch,
    replicate_tree,
    data_parallel_forward,
)
from . import multihost

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "replicate_tree",
    "data_parallel_forward",
    "multihost",
]
