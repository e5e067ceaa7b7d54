"""Loss functions: pixel, SSIM/MS-SSIM, VGG perceptual, GAN, combined."""

from facesr.losses.basic import l1_loss, l2_loss, charbonnier_loss
from facesr.losses.ssim import (
    create_gaussian_window,
    ssim,
    ms_ssim,
    ssim_loss,
    ms_ssim_loss,
)
from facesr.losses.perceptual import init_perceptual, perceptual_loss
from facesr.losses.gan import gan_loss
from facesr.losses.combined import (
    LossConfig,
    CombinedLoss,
    LossTracker,
    create_loss_function,
)

__all__ = [
    "l1_loss",
    "l2_loss",
    "charbonnier_loss",
    "create_gaussian_window",
    "ssim",
    "ms_ssim",
    "ssim_loss",
    "ms_ssim_loss",
    "init_perceptual",
    "perceptual_loss",
    "gan_loss",
    "LossConfig",
    "CombinedLoss",
    "LossTracker",
    "create_loss_function",
]
