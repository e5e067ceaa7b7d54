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
    "grid_sharding",
    "tp_param_shardings",
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
    if int(np.prod(shape)) != len(devices):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {int(np.prod(shape))} devices, "
            f"but {len(devices)} are available "
            f"({devices[0].platform if devices else 'none'}). On a CPU dev "
            f"host, provision a virtual mesh with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N.")
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


def grid_sharding(mesh: Mesh, batch_axis: str = "data",
                  row_axis: str = "space") -> NamedSharding:
    """2-D NHWC sharding: batch over `batch_axis` AND image rows over
    `row_axis` — dp x sp composition on a 2-D mesh (e.g. 4x2 over a v5e-8:
    4-way batch parallelism, each batch shard's rows split across 2 chips).
    XLA SPMD inserts the conv halo exchanges along the row axis and the
    gradient all-reduces along both; the train step and serving forward are
    unchanged code. Exactness vs single-device is gated in
    tests/test_parallel.py."""
    return NamedSharding(mesh, P(batch_axis, row_axis))


def tp_param_shardings(params: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Tensor-parallel sharding tree: conv kernels sharded over their
    OUTPUT-channel axis, matching 1-D biases/PReLU alphas sharded too;
    everything else (SE attention, narrow heads like conv_last's 3
    outputs) replicated. XLA SPMD then partitions every conv's output
    channels across the mesh and inserts the input all-gathers /
    channel-concat collectives — params memory (and conv FLOPs) divide by
    the mesh size, the tp axis for models too large to replicate. For
    facesr's 4.9M-param flagship this is a capability (memory) axis, not
    a speed axis — dp/sp remain the production shardings (BENCH.md).

    Uses the same attention-path exclusion as the int8 transforms so the
    tiny SE bottlenecks (width C/r, often indivisible) stay replicated.

    The rule is purely path/shape-based, so it applies to a whole
    `TrainState` too: the optimizer moments (mu/nu) mirror the param tree's
    paths and shapes and get the SAME shardings as their params, scalars
    (step counts, injected lr) stay replicated — that IS the tp train step:
    `jax.jit(step, in_shardings=(tp_param_shardings(state, mesh, axis),
    batch_sharding(mesh)))` trains with weight gradients and Adam moments
    sharded alongside the kernels (exactness gated in tests). Composes with
    dp on a 2-D ("data", "model") mesh.
    """
    # divisibility is against the TARGET axis's size, not the whole mesh —
    # on a 2-D (data, model) mesh only the model axis partitions channels
    n = int(mesh.shape[axis])

    def rule(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        if any(k == "ca" or k.startswith("fc") for k in keys):
            return NamedSharding(mesh, P())
        shape = np.shape(leaf)
        # shard the TRAILING (channel) axis whenever it divides: covers
        # 4-D/5-D kernels AND the scan-stacked biases / PReLU alphas
        # ([G, C] / [G, B, C]) whose moments otherwise stayed replicated
        # (any consistent sharding is semantically exact under SPMD; this
        # is the memory-capability rule)
        if len(shape) >= 1 and shape[-1] and shape[-1] % n == 0:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1) + [axis])))
        return NamedSharding(mesh, P())

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return treedef.unflatten([rule(p, l) for p, l in flat])


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
    if n == 0:
        # 0 % multiple == 0 would return the empty array "padded" and the
        # real failure would surface as an opaque XLA shape error later
        raise ValueError("pad_to_multiple: empty batch (0 rows) — nothing "
                         "to repeat for padding; check the upstream loader")
    rem = n % multiple
    if rem == 0:
        return array, n
    pad = multiple - rem
    filler = np.repeat(array[-1:], pad, axis=0)
    return np.concatenate([array, filler], axis=0), n
