"""Differentiable SSIM / MS-SSIM for NHWC tensors.

Numerics match the reference implementation
(`/root/reference/src/losses/ssim_loss.py`): 11x11 gaussian window
(sigma 1.5) applied as a depthwise convolution with SAME zero padding,
K = (0.01, 0.03), variance via E[x^2] - E[x]^2 (biased), MS-SSIM with the
standard 5 scale weights and 2x2 average-pool pyramid.

On TPU the depthwise gaussian filter runs as two separable 1-D grouped
`lax.conv_general_dilated` passes (the window is outer(g, g)); XLA fuses
the elementwise SSIM algebra around them. `create_gaussian_window` keeps
building the full 2-D window for golden tests against the reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from facesr.ops import conv2d, avg_pool2

__all__ = ["create_gaussian_window", "ssim", "ms_ssim", "ssim_loss", "ms_ssim_loss"]

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=16)
def create_gaussian_window(window_size: int, sigma: float, channels: int) -> np.ndarray:
    """Depthwise gaussian kernel, HWIO [k, k, 1, C] (reference ssim_loss.py:14-41)."""
    coords = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return np.tile(w2d[:, :, None, None], (1, 1, 1, channels))


@functools.lru_cache(maxsize=16)
def _gaussian_1d(window_size: int, sigma: float, channels: int) -> np.ndarray:
    """The 1-D factor of the gaussian window, [k, 1, 1, C]."""
    coords = np.arange(window_size, dtype=np.float32) - window_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.tile(g[:, None, None, None].astype(np.float32), (1, 1, 1, channels))


def _filter(x: jax.Array, window_size: int, sigma: float, channels: int) -> jax.Array:
    """Depthwise gaussian blur, SAME zero padding.

    The 2-D window is outer(g, g), so it runs as two 1-D depthwise passes
    (k+k taps instead of k*k — 5.5x fewer MACs at k=11). Equal to the full
    window up to float associativity; pinned by tests against the full
    2-D conv and the torch oracle."""
    g_col = jnp.asarray(_gaussian_1d(window_size, sigma, channels))
    pad = window_size // 2
    x = conv2d(x, g_col, padding=[(pad, pad), (0, 0)], feature_group_count=channels)
    g_row = g_col.reshape(1, window_size, 1, channels)
    return conv2d(x, g_row, padding=[(0, 0), (pad, pad)], feature_group_count=channels)


def _ssim_components(pred: jax.Array, target: jax.Array, window_size: int,
                     sigma: float, c1: float, c2: float):
    """Windowed luminance and contrast-structure terms, computed in f32.

    The f32 upcast lives HERE, not per caller: variance via
    E[x^2] - E[x]^2 cancels catastrophically below f32 (observed SSIM > 1
    on TPU — facesr.ops.conv), and leaving the guarantee to callers forked
    it between the training loss (which upcast) and the metrics surface
    (which did not). Shared by ssim() and every ms_ssim scale so the
    algebra cannot drift between the two."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    channels = pred.shape[-1]
    mu_p = _filter(pred, window_size, sigma, channels)
    mu_t = _filter(target, window_size, sigma, channels)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_pp = _filter(pred * pred, window_size, sigma, channels) - mu_pp
    sigma_tt = _filter(target * target, window_size, sigma, channels) - mu_tt
    sigma_pt = _filter(pred * target, window_size, sigma, channels) - mu_pt
    luminance = (2 * mu_pt + c1) / (mu_pp + mu_tt + c1)
    cs = (2 * sigma_pt + c2) / (sigma_pp + sigma_tt + c2)
    return luminance, cs


def ssim(
    pred: jax.Array,
    target: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    size_average: bool = True,
    K: Tuple[float, float] = (0.01, 0.03),
) -> jax.Array:
    """SSIM over NHWC images (reference ssim_loss.py:44-98)."""
    c1 = (K[0] * data_range) ** 2
    c2 = (K[1] * data_range) ** 2
    luminance, cs = _ssim_components(pred, target, window_size, sigma, c1, c2)
    ssim_map = luminance * cs

    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def ms_ssim(
    pred: jax.Array,
    target: jax.Array,
    window_size: int = 11,
    sigma: float = 1.5,
    data_range: float = 1.0,
    weights: Tuple[float, ...] = MS_SSIM_WEIGHTS,
) -> jax.Array:
    """Multi-scale SSIM (reference ssim_loss.py:101-171).

    Deviation from the reference: per-scale cs means clamp at 0 before
    the fractional-power product. The reference raises possibly-negative
    means to fractional powers — NaN in float, which as a training loss
    poisons every gradient for the rest of the run. Typical (positively
    correlated) images have cs > 0, where this is value-identical; the
    MS-SSIM torch-oracle parity test runs in that regime."""
    K = (0.01, 0.03)
    c1 = (K[0] * data_range) ** 2
    c2 = (K[1] * data_range) ** 2

    levels = len(weights)
    mcs = []
    msssim_last = None
    for i in range(levels):
        luminance, cs = _ssim_components(pred, target, window_size, sigma, c1, c2)
        if i == levels - 1:
            msssim_last = jnp.maximum((luminance * cs).mean(), 0.0)
        else:
            mcs.append(jnp.maximum(cs.mean(), 0.0))
            pred = avg_pool2(pred)
            target = avg_pool2(target)

    result = msssim_last
    for i, m in enumerate(mcs):
        result = result * (m ** weights[i])
    return result


def ssim_loss(pred: jax.Array, target: jax.Array, window_size: int = 11, **kwargs) -> jax.Array:
    """1 - SSIM (reference ssim_loss.py:174-226)."""
    return 1.0 - ssim(pred, target, window_size=window_size, **kwargs)


def ms_ssim_loss(pred: jax.Array, target: jax.Array, **kwargs) -> jax.Array:
    """1 - MS-SSIM (reference ssim_loss.py:229-277)."""
    return 1.0 - ms_ssim(pred, target, **kwargs)
