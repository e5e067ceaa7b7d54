"""NHWC convolution / activation primitives for TPU.

Thin functional wrappers over `lax.conv_general_dilated` with the TPU-native
(NHWC, HWIO) layouts. Mixed precision: pass `dtype=jnp.bfloat16` to run the
conv on the MXU in bf16 with float32 accumulation (`preferred_element_type`),
which replaces the reference's CUDA AMP GradScaler path
(`src/training/trainer.py:227` — bf16 on TPU needs no loss scaling).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "prelu", "leaky_relu", "global_avg_pool", "dense"]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: str | int = "SAME",
    feature_group_count: int = 1,
    dtype=None,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    `padding` of int k means symmetric spatial padding of k (PyTorch
    `padding=k`); "SAME" matches PyTorch's `padding=kernel//2` for odd
    kernels at stride 1.
    """
    if dtype is not None:
        x = x.astype(dtype)
    w = w.astype(x.dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    # No preferred_element_type upcast: XLA:TPU accumulates bf16 convs in
    # f32 internally regardless, and a f32 primitive output breaks the
    # conv transpose rule under grad (f32 cotangent vs bf16 operands).
    #
    # Precision: TPU lowers f32 convs to single-pass bf16 by default, which
    # silently breaks f32 semantics (e.g. SSIM's E[x^2]-E[x]^2 cancels
    # catastrophically -> SSIM > 1 observed on hardware). When the caller
    # asked for f32 (dtype None / f32 inputs), honor it with HIGHEST; the
    # bf16 fast path is the explicit dtype=bf16 policy.
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMSPEC,
        feature_group_count=feature_group_count,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Per-channel PReLU; alpha shape [C], x NHWC."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC -> [N, C] global average pool (SE squeeze)."""
    return x.mean(axis=(1, 2))


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, dtype=None) -> jax.Array:
    """[N, in] x [in, out] -> [N, out]."""
    if dtype is not None:
        x = x.astype(dtype)
    out = jnp.dot(
        x, w.astype(x.dtype),
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
