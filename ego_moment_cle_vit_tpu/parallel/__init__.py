"""Mesh and sharding helpers for data x model parallel training."""

from .mesh import create_mesh, local_device_count
from .sharding import (
    batch_sharding,
    param_sharding_rules,
    shard_params,
    replicate,
)

__all__ = [
    "create_mesh",
    "local_device_count",
    "batch_sharding",
    "param_sharding_rules",
    "shard_params",
    "replicate",
]
