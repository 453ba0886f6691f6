"""Device mesh / sharding rules for pjit training and inference."""

from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    param_specs,
    replicated,
    shard_params,
    shard_train_state,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "param_specs",
    "replicated",
    "shard_params",
    "shard_train_state",
]
