"""Mesh construction, sharding helpers, and collectives.

TPU-native replacement for the reference's NCCL/torch.distributed layer
(reference: distributed.py:7-124, train.py:432-447,555-579). Instead of
per-process NCCL process groups and DDP gradient hooks, parallelism is
expressed as a `jax.sharding.Mesh` plus sharding annotations; XLA inserts the
collectives (psum over ICI) inside the single jitted step.
"""

from .mesh import (
    DATA_AXIS,
    maybe_initialize_distributed,
    get_mesh,
    batch_sharding,
    train_batch_sharding,
    replicated,
    local_device_count,
    process_count,
    process_index,
    is_main_process,
    shard_batch,
    all_reduce_mean_tree,
    pad_to_multiple,
)
from .tp import MODEL_AXIS, get_2d_mesh, generator_param_shardings, shard_generator_params

__all__ = [
    "DATA_AXIS",
    "maybe_initialize_distributed",
    "get_mesh",
    "batch_sharding",
    "train_batch_sharding",
    "replicated",
    "local_device_count",
    "process_count",
    "process_index",
    "is_main_process",
    "shard_batch",
    "all_reduce_mean_tree",
    "pad_to_multiple",
    "MODEL_AXIS",
    "get_2d_mesh",
    "generator_param_shardings",
    "shard_generator_params",
]
