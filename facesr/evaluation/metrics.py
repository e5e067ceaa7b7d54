"""Evaluation metrics: PSNR, SSIM, LPIPS, FID + dataset evaluator.

Parity with reference `src/evaluation/metrics.py`:
  - functional `psnr` (batch-mean MSE) and per-image `psnr_batch` (:17-52)
  - `PSNR`/`SSIM` wrappers; SSIM reuses the loss implementation (:55-78,
    mirroring the reference's reuse at metrics.py:14)
  - `LPIPS` with graceful absence when trained weights are missing (:81-126)
  - `MetricCalculator.compute_metrics` / `evaluate_dataset` mean±std
    (:129-224)
  - `compute_fid` is declared but gated on an inception backend the same
    way the reference gates on pytorch-fid (:227-270): returns -1.0 with a
    warning when unavailable.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from facesr.losses.ssim import ssim as compute_ssim
from facesr.models import lpips as lpips_lib

__all__ = ["psnr", "psnr_batch", "PSNR", "SSIM", "LPIPS", "MetricCalculator", "compute_fid"]


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Batch-mean-MSE PSNR (NHWC or any layout)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return jnp.where(
        mse == 0,
        jnp.asarray(jnp.inf, jnp.float32),
        10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-20)),
    )


def psnr_batch(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-image PSNR over NHWC batch -> (B,). Agrees with `psnr` on the
    perfect-reconstruction case (inf, like skimage) instead of capping."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    return jnp.where(
        mse == 0,
        jnp.asarray(jnp.inf, jnp.float32),
        10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-20)),
    )


class PSNR:
    def __init__(self, data_range: float = 1.0):
        self.data_range = data_range

    def __call__(self, pred, target):
        return psnr(pred, target, self.data_range)


class SSIM:
    def __init__(self, data_range: float = 1.0, window_size: int = 11):
        self.data_range = data_range
        self.window_size = window_size

    def __call__(self, pred, target):
        return compute_ssim(pred, target, window_size=self.window_size,
                            data_range=self.data_range)


class LPIPS:
    """LPIPS metric; unavailable (returns 0.0, like the reference wrapper)
    unless converted AlexNet-LPIPS weights are present."""

    def __init__(self, net: str = "alex", weights_path: Optional[str] = None,
                 verbose: bool = False, assume_unit_range: bool = True):
        """assume_unit_range: inputs are [0,1] (every facesr caller) and are
        converted to [-1,1] without inspecting values. Set False to
        auto-detect like the reference wrapper (metrics.py:120-123) — that
        path costs a blocking device->host sync per call."""
        self.net = net
        self.assume_unit_range = assume_unit_range
        self.weights = lpips_lib.load_lpips_weights(weights_path)
        self.available = self.weights is not None
        if not self.available and verbose:
            print("Warning: LPIPS weights not found. LPIPS metric unavailable "
                  f"(set ${lpips_lib.ENV_WEIGHTS} to converted weights).")
        if self.available:
            self._jitted = jax.jit(lambda w, p, t: lpips_lib.lpips_distance(w, p, t))

    def __call__(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        if not self.available:
            return jnp.asarray(0.0)
        if self.assume_unit_range or float(pred.min()) >= 0:
            pred = pred * 2 - 1
            target = target * 2 - 1
        return self._jitted(self.weights, pred, target)


class MetricCalculator:
    """Batch + dataset-level metric computation."""

    def __init__(self, lpips_weights_path: Optional[str] = None):
        self.psnr = PSNR()
        self.ssim = SSIM()
        self.lpips = LPIPS(weights_path=lpips_weights_path)

    def compute_metrics(self, pred: jax.Array, target: jax.Array) -> Dict[str, float]:
        pred = jnp.asarray(pred)
        target = jnp.asarray(target)
        metrics = {
            "psnr": float(self.psnr(pred, target)),
            "ssim": float(self.ssim(pred, target)),
        }
        if self.lpips.available:
            metrics["lpips"] = float(self.lpips(pred, target))
        return metrics

    def evaluate_dataset(self, model: Callable, dataloader, desc: str = "Evaluating") -> Dict[str, float]:
        """model: callable NHWC LR batch -> SR batch (clamped internally or
        here). Returns mean±std metrics over the dataset.

        Deliberate reference parity (metrics.py:180-224): SSIM/LPIPS
        aggregate as unweighted means of per-BATCH means (a ragged last
        batch weighs its images more) and their std is across batch means,
        while PSNR is per-image. Kept identical so facesr numbers are
        comparable with reference-published tables."""
        all_psnr: List[float] = []
        all_ssim: List[float] = []
        all_lpips: List[float] = []

        for batch in dataloader:
            lr = jnp.asarray(batch["lr"])
            hr = jnp.asarray(batch["hr"])
            sr = jnp.clip(model(lr), 0.0, 1.0)
            all_psnr.extend(np.asarray(psnr_batch(sr, hr)).tolist())
            all_ssim.append(float(self.ssim(sr, hr)))
            if self.lpips.available:
                all_lpips.append(float(self.lpips(sr, hr)))

        if not all_psnr:
            # np.mean([]) would return NaN with only a RuntimeWarning and
            # silently poison downstream tables/best-model selection (the
            # same zero-batch class the Trainer guards against)
            raise RuntimeError(
                "evaluate_dataset received zero batches — empty eval split, "
                "or batch_size larger than the split with drop_last?")

        results = {
            "psnr_mean": float(np.mean(all_psnr)),
            "psnr_std": float(np.std(all_psnr)),
            "ssim_mean": float(np.mean(all_ssim)),
            "ssim_std": float(np.std(all_ssim)),
        }
        if all_lpips:
            results["lpips_mean"] = float(np.mean(all_lpips))
            results["lpips_std"] = float(np.std(all_lpips))
        return results


def compute_fid(real_images: List[np.ndarray], fake_images: List[np.ndarray]) -> float:
    """Fréchet Inception Distance. Requires converted InceptionV3 weights
    (none in this environment); degrades to -1.0 with a warning, the exact
    failure mode the reference has without pytorch-fid (metrics.py:264-270)."""
    try:
        from facesr.evaluation.fid import FIDUnavailable, fid_from_images

        return fid_from_images(real_images, fake_images)
    except (ImportError, FIDUnavailable, FileNotFoundError) as e:
        # only the BACKEND-ABSENT cases degrade: a broad RuntimeError catch
        # would also swallow genuine XLA failures (XlaRuntimeError
        # subclasses RuntimeError) and report them as a missing backend
        print(f"Warning: FID computation unavailable ({e}).")
        return -1.0
