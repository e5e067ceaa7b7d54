"""Image resize kernels with exact PyTorch `F.interpolate` semantics.

TPU-first design: a separable resize is a *linear* map along each spatial
axis, so instead of a gather-based kernel (slow on TPU: scalar addressing,
no MXU) we precompute the per-axis interpolation matrices on the host and
contract them with the image tensor as two small matmuls. XLA tiles these
onto the MXU and fuses the surrounding elementwise work; for the 64<->256
face-SR shapes the matrices are tiny (256x64) and live in VMEM.

Semantics match the reference's use of PyTorch bicubic resize
(`align_corners=False`, no antialias) — see reference
`src/models/custom.py:157-161` (model's global bicubic skip) and
`src/training/trainer.py:415-421` (on-the-fly LR synthesis) — which is the
single most important parity primitive in the framework (SURVEY.md §7).

All functions take NHWC tensors (TPU-native layout).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "resize_matrix",
    "resize2d",
    "bicubic_resize",
    "bicubic_up",
    "bicubic_down",
    "nearest_up",
    "avg_pool2",
]

# Keys cubic convolution constant used by PyTorch (and OpenCV) bicubic.
_A = -0.75


def _cubic_weights(t: np.ndarray) -> np.ndarray:
    """Cubic convolution weights for the 4 taps around fractional offset t.

    Matches PyTorch's `get_cubic_upsample_coefficients` (A = -0.75):
    taps at offsets [-1, 0, +1, +2] relative to floor(src).
    """
    A = _A

    def k1(x):  # |x| <= 1
        return ((A + 2.0) * x - (A + 3.0)) * x * x + 1.0

    def k2(x):  # 1 < |x| <= 2
        return ((A * x - 5.0 * A) * x + 8.0 * A) * x - 4.0 * A

    w0 = k2(t + 1.0)
    w1 = k1(t)
    w2 = k1(1.0 - t)
    w3 = k2(2.0 - t)
    return np.stack([w0, w1, w2, w3], axis=-1)


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, method: str = "bicubic") -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix for one axis.

    Reproduces PyTorch `F.interpolate(..., align_corners=False)` semantics:
    half-pixel source coordinates, Keys A=-0.75 cubic kernel (4 taps) with
    tap-index clamping at the borders; bilinear clamps the source coordinate
    itself at 0 (PyTorch's `area_pixel_compute_source_index`); `nearest` is
    PyTorch's legacy nearest (floor(i * in/out)).
    """
    if method not in ("bicubic", "bilinear", "nearest"):
        # validate BEFORE the same-size identity shortcut, or a typo'd
        # method is silently accepted whenever the sizes happen to match
        raise ValueError(f"Unknown resize method: {method}")
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == out_size:
        np.fill_diagonal(mat, 1.0)
        return mat.astype(np.float32)

    scale = in_size / out_size
    i = np.arange(out_size, dtype=np.float64)

    if method == "bicubic":
        src = (i + 0.5) * scale - 0.5
        base = np.floor(src).astype(np.int64)
        t = src - base
        w = _cubic_weights(t)  # [out, 4]
        for tap in range(4):
            idx = np.clip(base - 1 + tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), idx), w[:, tap])
    elif method == "bilinear":
        src = (i + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # PyTorch clamps the source coord for linear
        i0 = np.minimum(np.floor(src).astype(np.int64), in_size - 1)
        i1 = np.minimum(i0 + 1, in_size - 1)
        t = src - i0
        np.add.at(mat, (np.arange(out_size), i0), 1.0 - t)
        np.add.at(mat, (np.arange(out_size), i1), t)
    elif method == "nearest":
        idx = np.minimum((i * scale).astype(np.int64), in_size - 1)
        mat[np.arange(out_size), idx] = 1.0
    else:
        raise ValueError(f"Unknown resize method: {method}")

    return mat.astype(np.float32)


def resize2d(x: jax.Array, out_hw: Tuple[int, int], method: str = "bicubic") -> jax.Array:
    """Resize an NHWC tensor to (out_h, out_w) with PyTorch-parity kernels.

    Implemented as two matmul contractions (rows then columns) so the work
    lands on the MXU. Compute runs in float32 regardless of input dtype for
    numerical parity, result is cast back to the input dtype.
    """
    n, h, w, c = x.shape
    out_h, out_w = out_hw
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    if out_h != h:
        ah = jnp.asarray(resize_matrix(h, out_h, method))
        xf = jnp.einsum("oh,nhwc->nowc", ah, xf, precision=jax.lax.Precision.HIGHEST)
    if out_w != w:
        aw = jnp.asarray(resize_matrix(w, out_w, method))
        xf = jnp.einsum("ow,nhwc->nhoc", aw, xf, precision=jax.lax.Precision.HIGHEST)
    return xf.astype(orig_dtype)


def bicubic_resize(x: jax.Array, scale_factor: float) -> jax.Array:
    """`F.interpolate(x, scale_factor, mode='bicubic', align_corners=False)`.

    Works for both upscale (scale_factor > 1) and downscale (< 1, no
    antialias — matching the reference trainer's LR synthesis at
    `src/training/trainer.py:415-421`).
    """
    n, h, w, c = x.shape
    out_h = int(np.floor(h * scale_factor))
    out_w = int(np.floor(w * scale_factor))
    return resize2d(x, (out_h, out_w), method="bicubic")


def bicubic_up(x: jax.Array, scale: int) -> jax.Array:
    """Integer-scale bicubic upsample (the model's global skip path)."""
    return bicubic_resize(x, float(scale))


def bicubic_down(x: jax.Array, scale: int) -> jax.Array:
    """Integer-scale bicubic downsample (on-device LR synthesis)."""
    return bicubic_resize(x, 1.0 / float(scale))


def nearest_up(x: jax.Array, scale: int) -> jax.Array:
    """Integer-scale nearest upsample (ESRGAN upsampling path).

    For integer scale PyTorch legacy 'nearest' is a pure repeat; express it
    as broadcast+reshape which XLA fuses for free.
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, scale, w, scale, c))
    return x.reshape(n, h * scale, w * scale, c)


def avg_pool2(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool (MS-SSIM pyramid downsample).

    Matches `F.avg_pool2d(kernel_size=2, stride=2)` incl. floor division of
    odd spatial dims (trailing row/col dropped).
    """
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    x = x.reshape(n, h2, 2, w2, 2, c)
    return x.mean(axis=(2, 4))
