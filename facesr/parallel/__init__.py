"""Parallelism: device mesh, sharding, data-parallel training utilities."""

from facesr.parallel.mesh import (
    get_mesh,
    replicated,
    batch_sharding,
    row_sharding,
    grid_sharding,
    tp_param_shardings,
    shard_batch,
    replicate,
    pad_to_multiple,
)

__all__ = [
    "get_mesh",
    "replicated",
    "batch_sharding",
    "row_sharding",
    "grid_sharding",
    "tp_param_shardings",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
]
