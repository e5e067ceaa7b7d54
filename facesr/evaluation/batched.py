"""Batched evaluation: grouped LR synthesis + sharded SR forwards.

The reference eval loops run one batch-1 forward per image
(reference scripts/compare_two_models.py:268-334, test_model.py:260-333);
at its published 4,970-image eval that wastes ~10x wall-clock vs the
measured serving path. This helper lets the eval CLIs decode N images, run
chunked/padded sharded forwards through `ShardedPredictor`, and still
compute the identical per-image metrics: with dtype=None the batched
forward is elementwise the same computation as the per-image path (batch
entries are independent in a conv net), so metric values match exactly.

Mixed image sizes are handled by grouping indices per HR shape; each group
batches through one compiled program per shape.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["sr_batched", "synthesize_lr_batched", "make_predictor"]


import functools


@functools.cache
def _jitted_down():
    """One jitted bicubic-down per process: a fresh jax.jit wrapper per
    call would key a fresh compile cache (recompiles per call)."""
    import jax
    from facesr.ops import bicubic_down

    return jax.jit(bicubic_down, static_argnums=1)


def synthesize_lr_batched(hr_uint8_list: Sequence[np.ndarray], scale: int,
                          chunk: int = 32) -> List[np.ndarray]:
    """Trainer-matched LR synthesis (PyTorch-parity bicubic x1/scale) for a
    list of HWC uint8 images; batches same-shaped images per chunk."""
    import jax.numpy as jnp

    down = _jitted_down()
    out: List[Optional[np.ndarray]] = [None] * len(hr_uint8_list)
    for idxs in _groups_by_shape(hr_uint8_list).values():
        for start in range(0, len(idxs), chunk):
            sel = idxs[start:start + chunk]
            hr = np.stack([hr_uint8_list[i] for i in sel]).astype(np.float32) / 255.0
            lr = np.asarray(down(jnp.asarray(hr), scale))
            for j, i in enumerate(sel):
                out[i] = lr[j]
    return out  # type: ignore[return-value]


def make_predictor(model, max_batch: Optional[int] = None, dtype=None,
                   calibration=None):
    """ShardedPredictor with eval-CLI defaults; build ONCE per model and
    reuse across chunks (each construction compiles a program).
    `calibration` (int8_full only): LR images for static activation
    scales — the production-recommended quantized serving mode."""
    import jax
    from facesr.parallel.serving import ShardedPredictor

    if max_batch is None:
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        max_batch = 128 if on_tpu else 8
    return ShardedPredictor(model, dtype=dtype, max_batch=max_batch,
                            calibration=calibration)


def sr_batched(
    model,
    lr_float_list: Sequence[np.ndarray],
    max_batch: Optional[int] = None,
    dtype=None,
    predictor=None,
) -> List[np.ndarray]:
    """SR for a list of HWC float [0,1] LR images via ShardedPredictor.

    dtype=None reproduces the per-image eval path exactly (f32 with HIGHEST
    conv precision); pass jnp.bfloat16 for the fast serving configuration.
    Returns HWC uint8 SR images in input order.
    """
    out: List[Optional[np.ndarray]] = [None] * len(lr_float_list)
    if predictor is None:
        predictor = make_predictor(model, max_batch=max_batch, dtype=dtype)
    for idxs in _groups_by_shape(lr_float_list).values():
        batch = np.stack([lr_float_list[i] for i in idxs])
        sr = predictor(batch)
        for j, i in enumerate(idxs):
            out[i] = (np.clip(sr[j], 0, 1) * 255).round().astype(np.uint8)
    return out  # type: ignore[return-value]


def _groups_by_shape(images: Sequence[np.ndarray]) -> Dict[Tuple[int, ...], List[int]]:
    groups: Dict[Tuple[int, ...], List[int]] = {}
    for i, im in enumerate(images):
        groups.setdefault(tuple(im.shape), []).append(i)
    return groups
