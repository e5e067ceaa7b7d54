"""NumPy reimplementations of skimage PSNR/SSIM (eval-script parity).

The reference's eval scripts use scikit-image metrics on uint8 images with
data_range=255 (`scripts/test_model.py:193-202`), which differ subtly from
the training SSIM (uniform 7x7 window, sample covariance, border crop vs
gaussian window); SURVEY.md §7 requires keeping both code paths. skimage is
not available in this environment, so these reproduce its defaults:

  structural_similarity: win_size=7 uniform filter, K1=0.01, K2=0.03,
  use_sample_covariance=True (N/(N-1) correction), per-channel SSIM averaged
  over channels (channel_axis=-1), result cropped by (win-1)//2 so only
  valid windows contribute.
  peak_signal_noise_ratio: 10*log10(data_range^2 / mse).
"""

from __future__ import annotations

import numpy as np
import cv2

__all__ = ["peak_signal_noise_ratio", "structural_similarity"]


def peak_signal_noise_ratio(image_true: np.ndarray, image_test: np.ndarray,
                            data_range: float = 255.0) -> float:
    a = np.asarray(image_true, dtype=np.float64)
    b = np.asarray(image_test, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / mse))


def _uniform_filter(img: np.ndarray, win: int) -> np.ndarray:
    # Interior values equal scipy's uniform_filter for any boundary mode,
    # and skimage crops to the interior, so border handling is irrelevant.
    return cv2.boxFilter(img, ddepth=-1, ksize=(win, win),
                         normalize=True, borderType=cv2.BORDER_REFLECT)


def _ssim_single_channel(x: np.ndarray, y: np.ndarray, win: int,
                         data_range: float) -> float:
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win * win
    cov_norm = NP / (NP - 1)  # sample covariance (skimage default)

    ux = _uniform_filter(x, win)
    uy = _uniform_filter(y, win)
    uxx = _uniform_filter(x * x, win)
    uyy = _uniform_filter(y * y, win)
    uxy = _uniform_filter(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux * ux + uy * uy + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def structural_similarity(im1: np.ndarray, im2: np.ndarray,
                          data_range: float = 255.0,
                          channel_axis: int | None = None,
                          win_size: int = 7) -> float:
    im1 = np.asarray(im1)
    im2 = np.asarray(im2)
    if channel_axis is None and im1.ndim == 3:
        # skimage would treat this as VOLUMETRIC (3-D 7x7x7 windows) —
        # silently filtering each channel in 2-D here would disagree with
        # the library this module claims to reproduce
        raise ValueError(
            "3-D input without channel_axis: pass channel_axis=-1 for "
            "multichannel SSIM (volumetric SSIM is not implemented)")
    if win_size < 3 or win_size % 2 == 0:
        # skimage raises on even windows; accepting one here would crop
        # asymmetrically and silently drift from the library
        raise ValueError(f"win_size={win_size} must be an odd value >= 3")
    if channel_axis is not None:
        im1 = np.moveaxis(im1, channel_axis, -1)
        im2 = np.moveaxis(im2, channel_axis, -1)
    if min(im1.shape[0], im1.shape[1]) < win_size:
        # validated AFTER moveaxis so channel_axis=0 (CHW) inputs are
        # measured on their spatial dims; mirrors skimage's loud failure
        # instead of a NaN from an empty-crop mean
        raise ValueError(
            f"win_size={win_size} exceeds image extent "
            f"{im1.shape[:2]}; use larger images or a smaller odd win_size")
    if channel_axis is not None:
        vals = [
            _ssim_single_channel(im1[..., c], im2[..., c], win_size, data_range)
            for c in range(im1.shape[-1])
        ]
        return float(np.mean(vals))
    return _ssim_single_channel(im1, im2, win_size, data_range)
