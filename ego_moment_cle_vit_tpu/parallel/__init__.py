"""Mesh and sharding helpers for data x model parallel training."""

from .mesh import create_mesh, local_device_count
from .sharding import (
    batch_sharding,
    param_sharding_rules,
    shard_params,
    replicate,
)
from .shard_kernels import (
    active_kernel_mesh,
    kernel_mesh,
    kernel_spmd_mode,
    maybe_shard_map_batch,
    set_kernel_mesh,
    shard_map_batch,
    spmd_kernels_enabled,
)

__all__ = [
    "create_mesh",
    "local_device_count",
    "batch_sharding",
    "param_sharding_rules",
    "shard_params",
    "replicate",
    "active_kernel_mesh",
    "kernel_mesh",
    "kernel_spmd_mode",
    "maybe_shard_map_batch",
    "set_kernel_mesh",
    "shard_map_batch",
    "spmd_kernels_enabled",
]
