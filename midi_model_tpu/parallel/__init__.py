"""Device mesh / sharding rules for pjit training and inference."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    host_local_batch_to_global,
    make_mesh,
    process_shard,
    param_shardings,
    param_specs,
    replicated,
    replicated_from_local,
    shard_params,
    shard_train_state,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "host_local_batch_to_global",
    "make_mesh",
    "process_shard",
    "param_shardings",
    "param_specs",
    "replicated",
    "replicated_from_local",
    "shard_params",
    "shard_train_state",
]
