"""PixelShuffle (depth-to-space) with PyTorch channel ordering, NHWC layout.

PyTorch `nn.PixelShuffle(r)` maps input channel k = c*r^2 + dy*r + dx to
output channel c at spatial offset (dy, dx) (reference use:
`src/models/blocks.py:192-227`). On TPU this is a pure reshape/transpose
that XLA fuses into the surrounding convs — no custom kernel needed; the
fused conv+shuffle+PReLU epilogue is handled by XLA fusion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pixel_shuffle", "pixel_unshuffle"]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC [N, H, W, C*r^2] -> [N, H*r, W*r, C], torch channel order."""
    n, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(n, h, w, c, r, r)  # [..., c, dy, dx]
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, dy, w, dx, c
    return x.reshape(n, h * r, w * r, c)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Inverse of pixel_shuffle: [N, H*r, W*r, C] -> [N, H, W, C*r^2]."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, dy, dx
    return x.reshape(n, h, w, c * r * r)
