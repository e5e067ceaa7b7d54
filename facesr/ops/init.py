"""Weight initializers with exact PyTorch semantics, in TPU-native layouts.

Conv kernels are stored HWIO (height, width, in, out) — the native layout
for `lax.conv_general_dilated` on TPU — and dense kernels as [in, out].
Fan computations therefore mirror PyTorch's `_calculate_fan_in_and_fan_out`
on the equivalent OIHW / [out, in] tensors:

  conv  fan_in  = kh * kw * in_ch     fan_out = kh * kw * out_ch
  dense fan_in  = in_features         fan_out = out_features

Reference parity targets:
  - `initialize_weights` / Kaiming fan_out relu + zero bias:
    reference `src/models/custom.py:129-139`
  - zero-init of conv_last: `src/models/custom.py:141-145`
  - ICNR for PixelShuffle convs: `src/models/blocks.py:14-41`
  - PReLU slope init 0.25 (torch default `nn.PReLU`).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "calculate_gain",
    "kaiming_normal",
    "icnr",
    "zeros",
    "prelu_init",
]


def calculate_gain(nonlinearity: str, a: float = 0.0) -> float:
    """PyTorch `nn.init.calculate_gain`."""
    if nonlinearity == "relu":
        return math.sqrt(2.0)
    if nonlinearity == "leaky_relu":
        return math.sqrt(2.0 / (1.0 + a * a))
    if nonlinearity in ("linear", "conv2d", "sigmoid"):
        return 1.0
    if nonlinearity == "tanh":
        return 5.0 / 3.0
    raise ValueError(f"Unsupported nonlinearity: {nonlinearity}")


def _fans(shape: Sequence[int]) -> tuple[int, int]:
    """(fan_in, fan_out) for HWIO conv kernels or [in, out] dense kernels."""
    if len(shape) == 4:  # HWIO
        kh, kw, cin, cout = shape
        rf = kh * kw
        return cin * rf, cout * rf
    if len(shape) == 2:  # [in, out]
        return shape[0], shape[1]
    raise ValueError(f"Unsupported kernel shape: {shape}")


def kaiming_normal(
    key: jax.Array,
    shape: Sequence[int],
    mode: str = "fan_out",
    nonlinearity: str = "relu",
    a: float = 0.0,
    scale: float = 1.0,
    dtype=jnp.float32,
) -> jax.Array:
    """`nn.init.kaiming_normal_` on an HWIO conv / [in,out] dense kernel.

    `scale` supports the reference's post-init down-scaling idiom
    (`src/models/blocks.py:266-286` multiplies weights by 0.1).
    """
    fan_in, fan_out = _fans(shape)
    fan = fan_in if mode == "fan_in" else fan_out
    gain = calculate_gain(nonlinearity, a)
    std = gain / math.sqrt(fan)
    return (jax.random.normal(key, tuple(shape), dtype) * std * scale).astype(dtype)


def icnr(key: jax.Array, shape: Sequence[int], scale_factor: int = 2, dtype=jnp.float32) -> jax.Array:
    """ICNR init for a PixelShuffle conv kernel (HWIO, out = C * s^2).

    A [kh, kw, cin, cout/s^2] sub-kernel is drawn with Kaiming fan_out/relu
    and repeated s^2 times along the output axis so every sub-pixel starts
    identical — checkerboard-free, as in reference `src/models/blocks.py:14-41`.
    The repeat is `repeat_interleave` over the *output-channel* axis, which in
    PixelShuffle's channel ordering (c*s^2 + dy*s + dx) makes all s^2 phases
    of each output channel equal.
    """
    kh, kw, cin, cout = shape
    r2 = scale_factor ** 2
    if cout % r2:
        # a floor-divided sub-size would silently return a (cout//r2)*r2
        # kernel and surface later as an opaque conv shape mismatch
        raise ValueError(
            f"ICNR needs out channels divisible by scale^2: {cout} % {r2} != 0")
    sub = cout // r2
    # Torch draws the OIHW sub-kernel with kaiming fan_out(relu): fan_out
    # there is sub-kernel's out * rf. Build at the reduced out-size so std
    # matches, then repeat.
    sub_kernel = kaiming_normal(key, (kh, kw, cin, sub), mode="fan_out", nonlinearity="relu", dtype=dtype)
    return jnp.repeat(sub_kernel, r2, axis=3)


def zeros(shape: Sequence[int], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(tuple(shape), dtype)


def prelu_init(num_channels: int, init: float = 0.25, dtype=jnp.float32) -> jax.Array:
    """Per-channel PReLU slope, torch default 0.25."""
    return jnp.full((num_channels,), init, dtype)
