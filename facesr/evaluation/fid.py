"""Fréchet Inception Distance backend.

FID needs InceptionV3-pool3 activations; no pretrained Inception ships in
this environment (zero egress), so this backend activates only when
converted weights are provided via $FACESR_INCEPTION_WEIGHTS. The FID math
itself (Gaussian Fréchet distance between activation statistics) is
implemented here and unit-tested directly; the reference has the same
gated degradation via pytorch-fid (reference metrics.py:227-270).
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

__all__ = ["frechet_distance", "fid_from_activations", "fid_from_images"]

ENV_WEIGHTS = "FACESR_INCEPTION_WEIGHTS"


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    # sqrtm via eigendecomposition of the symmetrized product
    prod = sigma1 @ sigma2
    eigvals = np.linalg.eigvals(prod)
    # numerical noise can push tiny eigvals negative/complex
    covmean_trace = np.sum(np.sqrt(np.clip(eigvals.real, 0, None)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * covmean_trace)


def fid_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    """FID between two activation sets [N, D]."""
    mu1, mu2 = act1.mean(axis=0), act2.mean(axis=0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def fid_from_images(real_images: List[np.ndarray], fake_images: List[np.ndarray]) -> float:
    weights = os.environ.get(ENV_WEIGHTS)
    if not weights or not os.path.exists(weights):
        raise RuntimeError(
            f"InceptionV3 weights unavailable — set ${ENV_WEIGHTS} to converted weights"
        )
    raise RuntimeError("InceptionV3 activation backend not yet implemented")
