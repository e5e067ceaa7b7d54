"""Fréchet Inception Distance backend.

FID needs InceptionV3-pool3 activations — implemented natively in
`facesr.models.inception` (the pytorch-fid network variant). No pretrained
Inception ships in this environment (zero egress), so meaningful values
require converted weights via $FACESR_INCEPTION_WEIGHTS (converter:
`facesr.ckpt.convert.convert_inception_state_dict`); without them this
degrades gracefully exactly like the reference does without pytorch-fid
(reference metrics.py:227-270). The Fréchet math and the activation
pipeline are unit-tested directly.
"""

from __future__ import annotations

import functools as _functools
import os
from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "frechet_distance", "fid_from_activations", "inception_activations",
    "fid_from_images", "FIDUnavailable",
]

ENV_WEIGHTS = "FACESR_INCEPTION_WEIGHTS"


class FIDUnavailable(RuntimeError):
    """The FID backend cannot run (no converted InceptionV3 weights) —
    distinct from real runtime failures so callers can degrade gracefully
    on absence without masking genuine errors (metrics.compute_fid)."""


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    diff = mu1 - mu2
    # Tr(sqrt(S1 S2)) via the symmetric form: eig(S1 S2) == eig(R S2 R^T)
    # with R = sqrt(S1), so two symmetric eigh calls replace a nonsymmetric
    # eigvals of the product — faster at 2048x2048 and numerically stable.
    w1, v1 = np.linalg.eigh((sigma1 + sigma1.T) / 2)
    root1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    m = root1 @ ((sigma2 + sigma2.T) / 2) @ root1
    eigvals = np.linalg.eigvalsh((m + m.T) / 2)
    covmean_trace = np.sum(np.sqrt(np.clip(eigvals, 0, None)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * covmean_trace)


def fid_from_activations(act1: np.ndarray, act2: np.ndarray) -> float:
    """FID between two activation sets [N, D]."""
    if act1.shape[0] < 2 or act2.shape[0] < 2:
        # np.cov squeezes a (1, D) matrix to a scalar, which would crash
        # eigh with an error that never mentions the real cause
        raise ValueError(
            f"FID needs >=2 images per set to estimate covariances "
            f"(got {act1.shape[0]} vs {act2.shape[0]})")
    mu1, mu2 = act1.mean(axis=0), act2.mean(axis=0)
    s1 = np.cov(act1, rowvar=False)
    s2 = np.cov(act2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def inception_activations(images: List[np.ndarray], weights: Dict,
                          batch_size: int = 32) -> np.ndarray:
    """Pool3 activations [N, 2048] for a list of HWC images.

    Accepts uint8 or float; floats are assumed already in [0, 1]. Images may
    have mixed sizes — each batch is resized to 299x299 inside the jitted
    forward (pytorch-fid's resize_input default). Ragged tails are padded to
    the compiled batch size and trimmed, so only one program is compiled.
    """
    import jax
    import jax.numpy as jnp
    from facesr.models import inception

    size = (inception.INPUT_SIZE, inception.INPUT_SIZE)
    _inception_fwd, _resize_batch = _jitted()

    def to_float(img: np.ndarray) -> np.ndarray:
        arr = np.asarray(img)
        if arr.dtype == np.uint8:
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if arr.ndim == 3 and arr.shape[-1] == 1:  # grayscale, incl. (H, W, 1)
            arr = np.repeat(arr, 3, axis=-1)
        return arr

    outs = []
    for start in range(0, len(images), batch_size):
        chunk = [to_float(im) for im in images[start:start + batch_size]]
        # Pre-resize to 299 host-batched (grouped by shape) so ONE forward
        # program serves mixed input sizes; apply() skips its own resize.
        by_shape: Dict[tuple, list] = {}
        for i, im in enumerate(chunk):
            by_shape.setdefault(im.shape, []).append(i)
        for shape, idxs in by_shape.items():
            if shape[:2] == size:
                continue
            resized = np.asarray(_resize_batch(
                jnp.asarray(np.stack([chunk[i] for i in idxs]))))
            for j, i in enumerate(idxs):
                chunk[i] = resized[j]
        n = len(chunk)
        if n < batch_size:
            chunk += [np.zeros_like(chunk[0])] * (batch_size - n)
        batch = jnp.asarray(np.stack(chunk))
        acts = np.asarray(jax.device_get(_inception_fwd(weights, batch)))
        outs.append(acts[:n])
    return np.concatenate(outs, axis=0)


@_functools.lru_cache(maxsize=1)
def _jitted():
    """Process-cached jitted fns: jax.jit caches by function identity, so a
    fresh per-call lambda would recompile the 94-conv forward every call."""
    import jax
    from facesr.models import inception

    fwd = jax.jit(lambda p, x: inception.apply(p, x, resize_input=False))
    rsz = jax.jit(lambda x: inception.resize2d(
        x, (inception.INPUT_SIZE, inception.INPUT_SIZE), method="bilinear"))
    return fwd, rsz


def fid_from_images(real_images: List[np.ndarray], fake_images: List[np.ndarray],
                    weights: Optional[Dict] = None, batch_size: int = 32) -> float:
    """FID between two image sets using the native InceptionV3 backend."""
    from facesr.models.inception import load_inception_weights

    if weights is None:
        weights = load_inception_weights()
    if weights is None:
        raise FIDUnavailable(
            f"InceptionV3 weights unavailable — set ${ENV_WEIGHTS} to weights "
            f"converted with facesr.ckpt.convert (kind='inception')"
        )
    act_real = inception_activations(real_images, weights, batch_size)
    act_fake = inception_activations(fake_images, weights, batch_size)
    return fid_from_activations(act_real, act_fake)
