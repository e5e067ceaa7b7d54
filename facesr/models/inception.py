"""NHWC InceptionV3 feature extractor for FID (pool3, 2048-d).

The reference computes FID through the pytorch-fid package
(reference src/evaluation/metrics.py:227-270), which runs a slightly
modified torchvision InceptionV3 ("pt_inception-2015-12-05"): average-pool
branches use count_include_pad=False, and Mixed_7c's pool branch is a MAX
pool — both quirks of the original TF-Slim FID network, reproduced here.

This is a from-scratch JAX implementation driven by one architecture table
(CONV_SPECS) that both the forward pass and the weight converter
(facesr.ckpt.convert.convert_inception_state_dict) share, so structural
drift between them is impossible. BatchNorm (eps=1e-3, eval mode) is folded
into a per-conv (scale, bias) at conversion time.

Input contract (matches pytorch-fid defaults): NHWC float in [0, 1];
`apply` resizes to 299x299 bilinear (PyTorch align_corners=False semantics
via facesr.ops.resize) and maps to [-1, 1].
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from facesr.ops import conv2d
from facesr.ops.resize import resize2d

__all__ = [
    "CONV_SPECS", "BLOCKS", "apply", "load_inception_weights",
    "default_weights_path", "init_random_inception", "num_params",
]

ENV_WEIGHTS = "FACESR_INCEPTION_WEIGHTS"

# name -> (in_ch, out_ch, (kh, kw), stride, (pad_h, pad_w))
ConvSpec = Tuple[int, int, Tuple[int, int], int, Tuple[int, int]]


def _inception_a(name: str, in_ch: int, pool_ch: int) -> Dict[str, ConvSpec]:
    return {
        f"{name}.branch1x1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{name}.branch5x5_1": (in_ch, 48, (1, 1), 1, (0, 0)),
        f"{name}.branch5x5_2": (48, 64, (5, 5), 1, (2, 2)),
        f"{name}.branch3x3dbl_1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        f"{name}.branch3x3dbl_3": (96, 96, (3, 3), 1, (1, 1)),
        f"{name}.branch_pool": (in_ch, pool_ch, (1, 1), 1, (0, 0)),
    }


def _inception_b(name: str, in_ch: int) -> Dict[str, ConvSpec]:
    return {
        f"{name}.branch3x3": (in_ch, 384, (3, 3), 2, (0, 0)),
        f"{name}.branch3x3dbl_1": (in_ch, 64, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3dbl_2": (64, 96, (3, 3), 1, (1, 1)),
        f"{name}.branch3x3dbl_3": (96, 96, (3, 3), 2, (0, 0)),
    }


def _inception_c(name: str, in_ch: int, c7: int) -> Dict[str, ConvSpec]:
    return {
        f"{name}.branch1x1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{name}.branch7x7_1": (in_ch, c7, (1, 1), 1, (0, 0)),
        f"{name}.branch7x7_2": (c7, c7, (1, 7), 1, (0, 3)),
        f"{name}.branch7x7_3": (c7, 192, (7, 1), 1, (3, 0)),
        f"{name}.branch7x7dbl_1": (in_ch, c7, (1, 1), 1, (0, 0)),
        f"{name}.branch7x7dbl_2": (c7, c7, (7, 1), 1, (3, 0)),
        f"{name}.branch7x7dbl_3": (c7, c7, (1, 7), 1, (0, 3)),
        f"{name}.branch7x7dbl_4": (c7, c7, (7, 1), 1, (3, 0)),
        f"{name}.branch7x7dbl_5": (c7, 192, (1, 7), 1, (0, 3)),
        f"{name}.branch_pool": (in_ch, 192, (1, 1), 1, (0, 0)),
    }


def _inception_d(name: str, in_ch: int) -> Dict[str, ConvSpec]:
    return {
        f"{name}.branch3x3_1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3_2": (192, 320, (3, 3), 2, (0, 0)),
        f"{name}.branch7x7x3_1": (in_ch, 192, (1, 1), 1, (0, 0)),
        f"{name}.branch7x7x3_2": (192, 192, (1, 7), 1, (0, 3)),
        f"{name}.branch7x7x3_3": (192, 192, (7, 1), 1, (3, 0)),
        f"{name}.branch7x7x3_4": (192, 192, (3, 3), 2, (0, 0)),
    }


def _inception_e(name: str, in_ch: int) -> Dict[str, ConvSpec]:
    return {
        f"{name}.branch1x1": (in_ch, 320, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3_1": (in_ch, 384, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3_2a": (384, 384, (1, 3), 1, (0, 1)),
        f"{name}.branch3x3_2b": (384, 384, (3, 1), 1, (1, 0)),
        f"{name}.branch3x3dbl_1": (in_ch, 448, (1, 1), 1, (0, 0)),
        f"{name}.branch3x3dbl_2": (448, 384, (3, 3), 1, (1, 1)),
        f"{name}.branch3x3dbl_3a": (384, 384, (1, 3), 1, (0, 1)),
        f"{name}.branch3x3dbl_3b": (384, 384, (3, 1), 1, (1, 0)),
        f"{name}.branch_pool": (in_ch, 192, (1, 1), 1, (0, 0)),
    }


def _build_conv_specs() -> Dict[str, ConvSpec]:
    specs: Dict[str, ConvSpec] = {
        "Conv2d_1a_3x3": (3, 32, (3, 3), 2, (0, 0)),
        "Conv2d_2a_3x3": (32, 32, (3, 3), 1, (0, 0)),
        "Conv2d_2b_3x3": (32, 64, (3, 3), 1, (1, 1)),
        "Conv2d_3b_1x1": (64, 80, (1, 1), 1, (0, 0)),
        "Conv2d_4a_3x3": (80, 192, (3, 3), 1, (0, 0)),
    }
    specs.update(_inception_a("Mixed_5b", 192, 32))   # -> 256
    specs.update(_inception_a("Mixed_5c", 256, 64))   # -> 288
    specs.update(_inception_a("Mixed_5d", 288, 64))   # -> 288
    specs.update(_inception_b("Mixed_6a", 288))       # -> 768
    specs.update(_inception_c("Mixed_6b", 768, 128))
    specs.update(_inception_c("Mixed_6c", 768, 160))
    specs.update(_inception_c("Mixed_6d", 768, 160))
    specs.update(_inception_c("Mixed_6e", 768, 192))
    specs.update(_inception_d("Mixed_7a", 768))       # -> 1280
    specs.update(_inception_e("Mixed_7b", 1280))      # -> 2048
    specs.update(_inception_e("Mixed_7c", 2048))      # -> 2048
    return specs


CONV_SPECS: Dict[str, ConvSpec] = _build_conv_specs()
# (kind, name) in forward order; kinds drive the block dispatch in apply().
BLOCKS: List[Tuple[str, str]] = [
    ("stem", ""),
    ("A", "Mixed_5b"), ("A", "Mixed_5c"), ("A", "Mixed_5d"),
    ("B", "Mixed_6a"),
    ("C", "Mixed_6b"), ("C", "Mixed_6c"), ("C", "Mixed_6d"), ("C", "Mixed_6e"),
    ("D", "Mixed_7a"),
    ("E_avg", "Mixed_7b"),
    ("E_max", "Mixed_7c"),  # FIDInceptionE_2: pool branch is a MAX pool
]

FEATURE_DIM = 2048
INPUT_SIZE = 299


def num_params() -> int:
    """Expected parameter count: conv kernels + folded BN scale/bias."""
    return sum(kh * kw * ic * oc + 2 * oc
               for ic, oc, (kh, kw), _, _ in CONV_SPECS.values())


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _bconv(params: Dict, name: str, x: jax.Array) -> jax.Array:
    """BasicConv2d: conv (no bias) + folded BN + relu."""
    _, _, _, stride, (ph, pw) = CONV_SPECS[name]
    p = params[name]
    h = conv2d(x, p["w"], None, stride=stride, padding=[(ph, ph), (pw, pw)])
    return jax.nn.relu(h * p["scale"].astype(h.dtype) + p["bias"].astype(h.dtype))


def _max_pool(x: jax.Array, window: int, stride: int, pad: int = 0) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool3_noinc(x: jax.Array) -> jax.Array:
    """3x3 stride-1 pad-1 average pool with count_include_pad=False
    (the pytorch-fid FIDInception* pool branches)."""
    window = (1, 3, 3, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = lax.reduce_window(x, 0.0, lax.add, window, (1, 1, 1, 1), pad)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = lax.reduce_window(ones, 0.0, lax.add, window, (1, 1, 1, 1), pad)
    return s / counts


def _block_a(params: Dict, name: str, x: jax.Array) -> jax.Array:
    b1 = _bconv(params, f"{name}.branch1x1", x)
    b5 = _bconv(params, f"{name}.branch5x5_2",
                _bconv(params, f"{name}.branch5x5_1", x))
    b3 = _bconv(params, f"{name}.branch3x3dbl_1", x)
    b3 = _bconv(params, f"{name}.branch3x3dbl_2", b3)
    b3 = _bconv(params, f"{name}.branch3x3dbl_3", b3)
    bp = _bconv(params, f"{name}.branch_pool", _avg_pool3_noinc(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params: Dict, name: str, x: jax.Array) -> jax.Array:
    b3 = _bconv(params, f"{name}.branch3x3", x)
    bd = _bconv(params, f"{name}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{name}.branch3x3dbl_2", bd)
    bd = _bconv(params, f"{name}.branch3x3dbl_3", bd)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _block_c(params: Dict, name: str, x: jax.Array) -> jax.Array:
    b1 = _bconv(params, f"{name}.branch1x1", x)
    b7 = _bconv(params, f"{name}.branch7x7_1", x)
    b7 = _bconv(params, f"{name}.branch7x7_2", b7)
    b7 = _bconv(params, f"{name}.branch7x7_3", b7)
    bd = _bconv(params, f"{name}.branch7x7dbl_1", x)
    for i in (2, 3, 4, 5):
        bd = _bconv(params, f"{name}.branch7x7dbl_{i}", bd)
    bp = _bconv(params, f"{name}.branch_pool", _avg_pool3_noinc(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params: Dict, name: str, x: jax.Array) -> jax.Array:
    b3 = _bconv(params, f"{name}.branch3x3_2",
                _bconv(params, f"{name}.branch3x3_1", x))
    b7 = _bconv(params, f"{name}.branch7x7x3_1", x)
    for i in (2, 3, 4):
        b7 = _bconv(params, f"{name}.branch7x7x3_{i}", b7)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _block_e(params: Dict, name: str, x: jax.Array, pool: str) -> jax.Array:
    b1 = _bconv(params, f"{name}.branch1x1", x)
    b3 = _bconv(params, f"{name}.branch3x3_1", x)
    b3 = jnp.concatenate([
        _bconv(params, f"{name}.branch3x3_2a", b3),
        _bconv(params, f"{name}.branch3x3_2b", b3),
    ], axis=-1)
    bd = _bconv(params, f"{name}.branch3x3dbl_1", x)
    bd = _bconv(params, f"{name}.branch3x3dbl_2", bd)
    bd = jnp.concatenate([
        _bconv(params, f"{name}.branch3x3dbl_3a", bd),
        _bconv(params, f"{name}.branch3x3dbl_3b", bd),
    ], axis=-1)
    pooled = _avg_pool3_noinc(x) if pool == "avg" else _max_pool(x, 3, 1, pad=1)
    bp = _bconv(params, f"{name}.branch_pool", pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def apply(params: Dict, images: jax.Array, resize_input: bool = True,
          return_block_shapes: bool = False):
    """images: NHWC float in [0, 1] -> pool3 activations [N, 2048].

    resize_input mirrors pytorch-fid's default: bilinear to 299x299
    (PyTorch align_corners=False parity via facesr.ops.resize), then map
    to [-1, 1].
    """
    x = images
    if resize_input and x.shape[1:3] != (INPUT_SIZE, INPUT_SIZE):
        x = resize2d(x, (INPUT_SIZE, INPUT_SIZE), method="bilinear")
    x = x * 2.0 - 1.0

    shapes = {}
    # Stem
    x = _bconv(params, "Conv2d_1a_3x3", x)
    x = _bconv(params, "Conv2d_2a_3x3", x)
    x = _bconv(params, "Conv2d_2b_3x3", x)
    x = _max_pool(x, 3, 2)
    x = _bconv(params, "Conv2d_3b_1x1", x)
    x = _bconv(params, "Conv2d_4a_3x3", x)
    x = _max_pool(x, 3, 2)
    shapes["stem"] = x.shape

    dispatch = {"A": _block_a, "B": _block_b, "C": _block_c, "D": _block_d}
    for kind, name in BLOCKS[1:]:
        if kind.startswith("E"):
            x = _block_e(params, name, x, pool="avg" if kind == "E_avg" else "max")
        else:
            x = dispatch[kind](params, name, x)
        shapes[name] = x.shape

    acts = x.mean(axis=(1, 2))  # global average pool -> [N, 2048]
    if return_block_shapes:
        return acts, shapes
    return acts


# ---------------------------------------------------------------------------
# Weights
# ---------------------------------------------------------------------------

def default_weights_path() -> Optional[str]:
    from facesr.ckpt.weights import resolve_weights_path

    return resolve_weights_path(ENV_WEIGHTS, "inception_fid.fckpt")


def load_inception_weights(path: Optional[str] = None) -> Optional[Dict]:
    """Load converted FID-Inception weights; None when unavailable
    (graceful absence, like LPIPS / the reference's pytorch-fid gating)."""
    path = path or default_weights_path()
    if path is None or not os.path.exists(path):
        return None
    from facesr.ckpt import load_checkpoint

    tree, _ = load_checkpoint(path)
    params = jax.tree.map(jnp.asarray, tree)
    missing = [n for n in CONV_SPECS if n not in params]
    if missing:
        raise ValueError(f"Inception weights at {path} missing convs: {missing[:4]}...")
    return params


def init_random_inception(key: jax.Array) -> Dict:
    """Random weights with the exact production structure — unit tests only."""
    params = {}
    keys = jax.random.split(key, len(CONV_SPECS))
    for k, (name, (ic, oc, (kh, kw), _, _)) in zip(keys, sorted(CONV_SPECS.items())):
        params[name] = {
            "w": jax.random.normal(k, (kh, kw, ic, oc)) * np.sqrt(2.0 / (kh * kw * ic)),
            "scale": jnp.ones((oc,)),
            "bias": jnp.zeros((oc,)),
        }
    return params
