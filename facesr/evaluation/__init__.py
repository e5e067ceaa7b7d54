"""Evaluation: metrics (PSNR/SSIM/LPIPS/FID), skimage-compatible eval-path
metrics, visualization, Grad-CAM explainability."""

from facesr.evaluation.metrics import (
    psnr,
    psnr_batch,
    PSNR,
    SSIM,
    LPIPS,
    MetricCalculator,
    compute_fid,
)
from facesr.evaluation.skimage_compat import (
    peak_signal_noise_ratio,
    structural_similarity,
)
from facesr.evaluation.visualize import (
    tensor_to_image,
    create_comparison_grid,
    create_zoom_comparison,
    create_metrics_table,
    plot_training_curves,
    save_sr_result,
)

__all__ = [
    "psnr",
    "psnr_batch",
    "PSNR",
    "SSIM",
    "LPIPS",
    "MetricCalculator",
    "compute_fid",
    "peak_signal_noise_ratio",
    "structural_similarity",
    "tensor_to_image",
    "create_comparison_grid",
    "create_zoom_comparison",
    "create_metrics_table",
    "plot_training_curves",
    "save_sr_result",
]
