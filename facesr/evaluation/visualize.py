"""Visualization helpers: comparison grids, zoom panels, metric tables,
training-curve plots (reference `src/evaluation/visualize.py`).

Host-side matplotlib/cv2 — unchanged idiom from the reference since none of
this is accelerator work. All image tensors here are NHWC (or HWC) floats
in [0, 1] or uint8.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
import cv2

import matplotlib

# force=False: respect a backend the host already chose (e.g. a notebook's
# inline backend — these helpers return figures for exactly that use);
# headless environments still get Agg
matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt

__all__ = [
    "tensor_to_image",
    "create_comparison_grid",
    "create_zoom_comparison",
    "create_metrics_table",
    "plot_training_curves",
    "save_sr_result",
]


def tensor_to_image(tensor) -> np.ndarray:
    """HWC/NHWC float [0,1] (or CHW torch-style) -> HWC uint8."""
    arr = np.asarray(tensor)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 3 and arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = arr.transpose(1, 2, 0)  # CHW -> HWC
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]  # (H, W, 1) crashes imshow/cvtColor downstream
    arr = np.clip(arr, 0, 1) if arr.dtype != np.uint8 else arr
    if arr.dtype != np.uint8:
        arr = (arr * 255).round().astype(np.uint8)
    return arr


def _imshow(ax, img: np.ndarray) -> None:
    # single-channel images come out of tensor_to_image as 2-D; without an
    # explicit cmap matplotlib false-colors them with viridis
    ax.imshow(img, cmap="gray" if img.ndim == 2 else None)


def create_comparison_grid(
    images: Dict[str, np.ndarray],
    save_path: Optional[str] = None,
    title: str = "Super-Resolution Comparison",
    figsize_per_image: int = 4,
):
    """One row of labeled images (reference visualize.py:15-56)."""
    n = len(images)
    fig, axes = plt.subplots(1, n, figsize=(figsize_per_image * n, figsize_per_image))
    if n == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, images.items()):
        _imshow(ax, tensor_to_image(img))
        ax.set_title(name)
        ax.axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_zoom_comparison(
    images: Dict[str, np.ndarray],
    zoom_region: Optional[tuple] = None,
    save_path: Optional[str] = None,
    title: str = "Zoom Comparison",
):
    """Two rows: full images + zoomed crops (reference visualize.py:59-105).

    zoom_region: (y, x, h, w) in pixels of the first image; defaults to the
    center quarter.
    """
    n = len(images)
    first = tensor_to_image(next(iter(images.values())))
    H, W = first.shape[:2]
    if zoom_region is None:
        zoom_region = (H // 4, W // 4, H // 2, W // 2)
    y, x, h, w = zoom_region

    fig, axes = plt.subplots(2, n, figsize=(4 * n, 8))
    if n == 1:
        axes = axes.reshape(2, 1)
    for col, (name, img) in enumerate(images.items()):
        img = tensor_to_image(img)
        sy, sx = img.shape[0] / H, img.shape[1] / W
        _imshow(axes[0, col], img)
        axes[0, col].set_title(name)
        axes[0, col].axis("off")
        ys, xs, hs, ws = int(y * sy), int(x * sx), int(h * sy), int(w * sx)
        _imshow(axes[1, col], img[ys:ys + hs, xs:xs + ws])
        axes[1, col].set_title(f"{name} (zoom)")
        axes[1, col].axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def create_metrics_table(
    results: Dict[str, Dict[str, float]],
    save_path: Optional[str] = None,
    metrics: Sequence[str] = ("psnr", "ssim", "lpips"),
) -> str:
    """Markdown table of per-method metrics (reference visualize.py:108-152)."""
    header = "| Method | " + " | ".join(m.upper() for m in metrics) + " |"
    sep = "|---" * (len(metrics) + 1) + "|"
    rows = [header, sep]
    for method, vals in results.items():
        cells = []
        for m in metrics:
            v = vals.get(m, vals.get(f"{m}_mean"))
            cells.append(f"{v:.4f}" if v is not None else "—")
        rows.append(f"| {method} | " + " | ".join(cells) + " |")
    table = "\n".join(rows)
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        Path(save_path).write_text(table + "\n")
    return table


def plot_training_curves(
    history: Dict[str, List[float]],
    save_path: Optional[str] = None,
    title: str = "Training Curves",
):
    """Loss/PSNR/SSIM/LR panel (reference visualize.py:155-203)."""
    panels = [
        ("Loss", ["train_loss", "val_loss"]),
        ("PSNR (dB)", ["val_psnr"]),
        ("SSIM", ["val_ssim"]),
        ("Learning rate", ["learning_rate"]),
    ]
    fig, axes = plt.subplots(2, 2, figsize=(12, 8))
    for ax, (name, keys) in zip(axes.flat, panels):
        for k in keys:
            if k in history and history[k]:
                ax.plot(history[k], label=k)
        ax.set_title(name)
        ax.set_xlabel("epoch")
        if name == "Learning rate":
            ax.set_yscale("log")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        Path(save_path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return None
    return fig


def save_sr_result(sr_image, save_path: str) -> None:
    """Save an SR output (any supported tensor form) as PNG (BGR on disk)."""
    img = tensor_to_image(sr_image)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(save_path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
