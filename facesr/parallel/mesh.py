"""Device mesh and sharding utilities.

The reference is single-GPU (SURVEY.md §2/§5: no distributed layer exists);
this module is the TPU-native scaling layer that replaces it: a 1-D `data`
mesh over all chips (v5e-8 target), params replicated, batches sharded on
the leading axis. Gradients reduce over ICI automatically — under jit with
NamedSharding inputs, XLA inserts the all-reduces (psum) for the replicated
parameter gradients; no hand-written collectives are needed for pure data
parallelism. A `model` axis is provisioned for future tensor-parallel
sharding of the conv channel dimension.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "get_mesh",
    "replicated",
    "batch_sharding",
    "row_sharding",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
]


def get_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (or reshaped) mesh over the given devices with Auto axis types
    (classic pjit-style sharding propagation)."""
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def row_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard NHWC images along H: the spatial-parallel axis for
    large-image / batch-1 serving (see serving.SpatialPredictor). The mesh
    axis is the same physical `data` ring — what changes is which tensor
    dimension rides it."""
    return NamedSharding(mesh, P(None, axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a (possibly nested) batch with its leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(array: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad the leading axis to a multiple by repeating the last element.

    Returns (padded, valid_count). Used for final partial validation batches
    so every batch divides evenly across the mesh.
    """
    n = array.shape[0]
    rem = n % multiple
    if rem == 0:
        return array, n
    pad = multiple - rem
    filler = np.repeat(array[-1:], pad, axis=0)
    return np.concatenate([array, filler], axis=0), n
