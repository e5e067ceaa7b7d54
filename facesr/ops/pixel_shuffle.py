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

__all__ = ["pixel_shuffle", "pixel_unshuffle", "subpixel_pack_kernel"]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC [N, H, W, C*r^2] -> [N, H*r, W*r, C], torch channel order."""
    n, h, w, cr2 = x.shape
    c = cr2 // (r * r)
    x = x.reshape(n, h, w, c, r, r)  # [..., c, dy, dx]
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, dy, w, dx, c
    return x.reshape(n, h * r, w * r, c)


def subpixel_pack_kernel(k: jax.Array, r: int = 2) -> jax.Array:
    """Rewrite a 3x3 kernel that consumes a PixelShuffle(2) output into an
    equivalent 3x3 kernel on the PACKED (pre-shuffle) layout:

        conv3x3(pixel_shuffle(x, 2), k)  ==  pixel_shuffle(conv3x3(x, k'), 2)

    with k' = subpixel_pack_kernel(k). Output pixel (2i+dy, 2j+dx) of the
    original conv reads shuffled rows 2i+dy+u-1 (u in 0..2); mapping each
    tap to (packed row offset, phase) = divmod(dy+u-1, 2) lands every tap
    in packed offsets {-1,0,1} — a 3x3 packed conv, and SAME zero-padding
    of one packed row/col covers exactly the original's one-shuffled-row
    padding. Channel order follows torch PixelShuffle (c major, phase
    minor: packed = c*r^2 + py*r + px). Exact for integer (s8xs8->s32)
    convolution — accumulation is associative; used by the int8 serving
    path to consume the packed tensor directly and skip the depth-to-space
    copies of the full-size feature map (BENCH.md round 2 trace).
    """
    kh, kw, cin, cout = k.shape
    if kh != 3 or kw != 3 or r != 2:
        raise NotImplementedError("subpixel_pack_kernel supports 3x3, r=2")
    packed = jnp.zeros((3, 3, cin * 4, cout * 4), k.dtype)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    di, py = divmod(dy + u - 1, 2)
                    dj, px = divmod(dx + v - 1, 2)
                    packed = packed.at[
                        di + 1, dj + 1, py * 2 + px::4, dy * 2 + dx::4
                    ].set(k[u, v])
    return packed


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """Inverse of pixel_shuffle: [N, H*r, W*r, C] -> [N, H, W, C*r^2]."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, dy, dx
    return x.reshape(n, h, w, c * r * r)
