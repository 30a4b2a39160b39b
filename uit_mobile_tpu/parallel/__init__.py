from .mesh import (
    make_mesh,
    dp_placement,
    replicated,
    batch_sharded,
    shard_batch,
    replicate_tree,
    data_parallel_forward,
)
from .tp import (
    make_mesh_2d,
    tp_param_specs,
    shard_params,
    sharded_opt_init,
    tensor_parallel_forward,
)
from .pp import (
    make_pipe_mesh,
    stack_block_params,
    pipeline_forward,
)
from .fsdp import (
    fsdp_param_specs,
    fsdp_shard_params,
    hybrid_param_specs,
    hybrid_shard_params,
)
from .sp import (
    make_seq_mesh,
    sequence_parallel_forward,
)
from .ep import (
    make_expert_mesh,
    ep_param_specs,
    ep_shard_params,
    expert_parallel_forward,
    make_moe_train_step,
)
from . import multihost

__all__ = [
    "make_mesh",
    "dp_placement",
    "replicated",
    "batch_sharded",
    "shard_batch",
    "replicate_tree",
    "data_parallel_forward",
    "make_mesh_2d",
    "tp_param_specs",
    "shard_params",
    "sharded_opt_init",
    "tensor_parallel_forward",
    "make_pipe_mesh",
    "stack_block_params",
    "pipeline_forward",
    "fsdp_param_specs",
    "fsdp_shard_params",
    "hybrid_param_specs",
    "hybrid_shard_params",
    "make_seq_mesh",
    "sequence_parallel_forward",
    "make_expert_mesh",
    "ep_param_specs",
    "ep_shard_params",
    "expert_parallel_forward",
    "make_moe_train_step",
    "multihost",
]
