"""Sharded inference serving: batch-parallel SR across a device mesh.

The v5e-8 serving path for the BASELINE.json north star (images/sec on an
8-chip pod): batches are sharded over the `data` axis, params replicated,
and each chip runs the jitted forward — throughput scales linearly in
chips since there is no cross-image communication in the model. Partial
batches are padded to a mesh multiple and trimmed after.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from facesr.parallel.mesh import get_mesh, replicate, batch_sharding, pad_to_multiple

__all__ = ["ShardedPredictor"]


class ShardedPredictor:
    """Wraps a model wrapper (.apply_fn/.params/.config) for sharded serving.

    Args:
        model: FaceEnhanceNet / RRDBNet / TransferSRModel wrapper.
        mesh: optional Mesh (defaults to all devices on a `data` axis).
        dtype: compute dtype (bf16 default on TPU; None = f32 parity path;
            "int8" serves per-channel int8 weights with bf16 activations —
            4x smaller weights, throughput parity; "int8_full" also
            quantizes activations per image so convs run on the MXU's
            native s8 pipe — fastest, with a larger quality delta
            documented in BENCH.md).
        max_batch: compiled batch size; larger inputs are chunked, smaller
            padded (one compiled program total).
    """

    def __init__(self, model, mesh=None, dtype=jnp.bfloat16, max_batch: int = 128):
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.max_batch = max(max_batch - max_batch % self.n_devices, self.n_devices)
        apply_fn = model.apply_fn
        from facesr.parallel.mesh import replicated

        if dtype == "int8":
            from facesr.ops.quant import quantize_pytree, dequantize_pytree

            q_tree, s_tree = quantize_pytree(model.params)
            self.params = replicate({"q": q_tree, "s": s_tree}, self.mesh)

            def forward(params, x):
                deq = dequantize_pytree(params["q"], params["s"], jnp.bfloat16)
                return jnp.clip(apply_fn(deq, x, train=False, dtype=jnp.bfloat16),
                                0.0, 1.0)
        elif dtype == "int8_full":
            # Weights AND activations int8: convs run on the MXU's s8 pipe
            # (2x the bf16 conv rate on v5e — BENCH.md); elementwise tail
            # stays bf16. Larger quality delta than weight-only "int8".
            from facesr.ops.quant import quantize_conv_kernels

            self.params = replicate(quantize_conv_kernels(model.params), self.mesh)

            def forward(params, x):
                return jnp.clip(apply_fn(params, x, train=False, dtype=jnp.bfloat16),
                                0.0, 1.0)
        else:
            self.params = replicate(model.params, self.mesh)

            def forward(params, x):
                return jnp.clip(apply_fn(params, x, train=False, dtype=dtype),
                                0.0, 1.0)

        self._fwd = jax.jit(
            forward,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """NHWC float batch (any size) -> SR batch, chunked/padded to the
        compiled batch size (always max_batch, so the whole lifetime of the
        predictor uses ONE compiled program — padding only to a device
        multiple would recompile for every distinct remainder size)."""
        images = np.asarray(images, np.float32)
        outs = []
        for i in range(0, len(images), self.max_batch):
            chunk = images[i:i + self.max_batch]
            valid = len(chunk)
            if valid < self.max_batch:
                filler = np.repeat(chunk[-1:], self.max_batch - valid, axis=0)
                chunk = np.concatenate([chunk, filler], axis=0)
            x = jax.device_put(chunk, batch_sharding(self.mesh))
            y = self._fwd(self.params, x)
            outs.append(np.asarray(y[:valid]))
        return np.concatenate(outs, axis=0)
