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
from facesr.parallel.pipeline import (
    pp_param_shardings,
    make_pp_apply,
)

__all__ = [
    "pp_param_shardings",
    "make_pp_apply",
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
