"""Native JAX LPIPS (AlexNet backbone + learned linear heads).

The reference wraps the `lpips` pip package (AlexNet default,
`src/evaluation/metrics.py:81-126`). That package isn't in this
environment, so this is a from-scratch NHWC implementation of the same
computation:

  input in [-1, 1] -> per-channel shift/scale -> AlexNet features
  (relu1..relu5) -> channel-unit-normalize -> squared diff -> 1x1 linear
  head (non-negative weights) -> spatial mean -> sum over layers.

Trained weights (required for meaningful values) are imported from the
lpips package's checkpoint via `facesr.ckpt.convert.convert_lpips_weights`
and loaded from `FACESR_LPIPS_WEIGHTS` (or an explicit path). Without them
the metric reports unavailable — mirroring the reference's graceful-absence
behavior.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from facesr.ops import conv2d

__all__ = ["lpips_distance", "load_lpips_weights", "default_weights_path"]

# (out_ch, kernel, stride, pad) for AlexNet features' conv layers
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# max-pool (kernel 3, stride 2) after relu1 and relu2
_POOL_AFTER = {0, 1}

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

ENV_WEIGHTS = "FACESR_LPIPS_WEIGHTS"


def default_weights_path() -> Optional[str]:
    from facesr.ckpt.weights import resolve_weights_path

    return resolve_weights_path(ENV_WEIGHTS, "lpips_alex.fckpt")


def load_lpips_weights(path: Optional[str] = None) -> Optional[Dict]:
    """Load converted LPIPS weights; None when unavailable."""
    path = path or default_weights_path()
    if path is None or not os.path.exists(path):
        return None
    from facesr.ckpt import load_checkpoint

    tree, _ = load_checkpoint(path)
    tree = jax.tree.map(jnp.asarray, tree)
    if isinstance(tree.get("convs"), dict):
        tree["convs"] = [tree["convs"][k] for k in sorted(tree["convs"], key=int)]
    if isinstance(tree.get("lins"), dict):
        tree["lins"] = [tree["lins"][k] for k in sorted(tree["lins"], key=int)]
    return tree


def _max_pool3_2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _alexnet_features(params: List[Dict], x: jax.Array) -> List[jax.Array]:
    feats = []
    h = x
    for i, ((out_ch, k, stride, pad), p) in enumerate(zip(_ALEX_CONVS, params)):
        h = conv2d(h, p["w"], p["b"], stride=stride, padding=pad)
        h = jax.nn.relu(h)
        feats.append(h)
        if i in _POOL_AFTER:
            h = _max_pool3_2(h)
    return feats


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips_distance(weights: Dict, pred: jax.Array, target: jax.Array) -> jax.Array:
    """LPIPS distance per the lpips-pkg computation. pred/target: NHWC in
    [-1, 1] (callers convert from [0,1] like the reference wrapper)."""
    shift = jnp.asarray(_SHIFT, pred.dtype)
    scale = jnp.asarray(_SCALE, pred.dtype)
    xp = (pred - shift) / scale
    xt = (target - shift) / scale

    fp = _alexnet_features(weights["convs"], xp)
    ft = _alexnet_features(weights["convs"], xt)

    total = jnp.asarray(0.0, jnp.float32)
    for f0, f1, lin in zip(fp, ft, weights["lins"]):
        d = (_unit_normalize(f0) - _unit_normalize(f1)) ** 2
        # 1x1 conv head == channel-weighted sum; lin['w'] shape [C, 1]
        val = jnp.einsum("nhwc,co->nhwo", d, lin["w"].astype(d.dtype))
        total = total + val.mean(axis=(1, 2, 3)).mean()
    return total


def init_random_alexnet(key: jax.Array) -> Dict:
    """Random-init LPIPS weights — for unit tests ONLY (structure checks);
    values are not perceptually meaningful."""
    from facesr.ops import init as finit

    convs = []
    in_ch = 3
    keys = jax.random.split(key, len(_ALEX_CONVS) * 2)
    for i, (out_ch, k, stride, pad) in enumerate(_ALEX_CONVS):
        convs.append({
            "w": finit.kaiming_normal(keys[2 * i], (k, k, in_ch, out_ch)),
            "b": jnp.zeros((out_ch,)),
        })
        in_ch = out_ch
    lins = [
        {"w": jax.random.uniform(keys[2 * i + 1], (c, 1)) * 0.1}
        for i, c in enumerate([64, 192, 384, 256, 256])
    ]
    return {"convs": convs, "lins": lins}
