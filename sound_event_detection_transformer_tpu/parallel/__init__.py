"""SPMD parallelism: device mesh, shardings, optimizer, rank utilities."""
from .distribute import (
    get_rank,
    get_world_size,
    is_dist_avail_and_initialized,
    is_main_process,
    reduce_dict,
)
from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_mesh,
    param_sharding,
    process_is_main,
    replicated,
    shard_batch_pytree,
)
from .optim import cosine_lr, ema_update, make_optimizer, step_lr

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding",
    "replicated",
    "shard_batch_pytree",
    "process_is_main",
    "initialize_distributed",
    "make_optimizer",
    "step_lr",
    "cosine_lr",
    "ema_update",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "is_dist_avail_and_initialized",
    "reduce_dict",
]
