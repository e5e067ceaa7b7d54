"""Native JAX VGG19 feature extractor (for perceptual loss).

The reference uses torchvision's pretrained VGG19
(`/root/reference/src/losses/perceptual.py:21-105`); this is a from-scratch
NHWC implementation with the same module sequence and layer naming, so the
torchvision layer-name map ('conv1_1' ... 'pool5') is preserved. Pretrained
weights can be imported from a torchvision `vgg19` state_dict via
`facesr.ckpt.convert.convert_vgg19_state_dict`; without them a fixed-seed
Kaiming init is used (feature-matching against a *fixed* random deep
network is still a usable training signal, and unit tests only rely on
structure). Weights are frozen by construction — they live outside the
optimizer's param tree.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from facesr.ops import conv2d
from facesr.ops import init as finit

# Channel progression of VGG19 features; 'M' = 2x2 max pool.
VGG19_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
             512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# torchvision vgg19.features Sequential index for each named layer
# (reference perceptual.py:21-30). conv names point at the Conv2d module,
# i.e. features are captured post-conv, pre-ReLU.
LAYER_MAP = {
    "conv1_1": 0, "relu1_1": 1, "conv1_2": 2, "relu1_2": 3, "pool1": 4,
    "conv2_1": 5, "relu2_1": 6, "conv2_2": 7, "relu2_2": 8, "pool2": 9,
    "conv3_1": 10, "relu3_1": 11, "conv3_2": 12, "relu3_2": 13,
    "conv3_3": 14, "relu3_3": 15, "conv3_4": 16, "relu3_4": 17, "pool3": 18,
    "conv4_1": 19, "relu4_1": 20, "conv4_2": 21, "relu4_2": 22,
    "conv4_3": 23, "relu4_3": 24, "conv4_4": 25, "relu4_4": 26, "pool4": 27,
    "conv5_1": 28, "relu5_1": 29, "conv5_2": 30, "relu5_2": 31,
    "conv5_3": 32, "relu5_3": 33, "conv5_4": 34, "relu5_4": 35, "pool5": 36,
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def module_sequence() -> List[tuple]:
    """[(torchvision_index, kind, conv_number)] for the features stack."""
    seq = []
    idx = 0
    conv_no = 0
    for c in VGG19_CFG:
        if c == "M":
            seq.append((idx, "pool", None))
            idx += 1
        else:
            seq.append((idx, "conv", conv_no))
            idx += 1
            seq.append((idx, "relu", None))
            idx += 1
            conv_no += 1
    return seq


def num_convs_needed(max_index: int) -> int:
    return sum(1 for i, kind, _ in module_sequence() if kind == "conv" and i <= max_index)


ENV_WEIGHTS = "FACESR_VGG19_WEIGHTS"


def load_vgg19_weights(path: str | None = None) -> List[Dict[str, jax.Array]] | None:
    """Converted torchvision VGG19 conv list (facesr.ckpt.convert kind
    'vgg19'), or None when unavailable — the same env-var gating as LPIPS
    ($FACESR_VGG19_WEIGHTS / bundled weights/vgg19.fckpt). Restores the
    msgpack digit-keyed-dict round-trip of the saved list."""
    from facesr.ckpt import load_checkpoint
    from facesr.ckpt.weights import resolve_weights_path

    path = path or resolve_weights_path(ENV_WEIGHTS, "vgg19.fckpt")
    if path is None:
        return None
    tree, _ = load_checkpoint(path)
    convs = tree["convs"] if "convs" in tree else tree
    if isinstance(convs, dict):
        convs = [convs[k] for k in sorted(convs, key=int)]
    return [jax.tree.map(jnp.asarray, c) for c in convs]


def init_vgg19(key: jax.Array, max_index: int = 36) -> List[Dict[str, jax.Array]]:
    """Conv params (list ordered by depth) up to torchvision index max_index."""
    params = []
    in_ch = 3
    conv_needed = num_convs_needed(max_index)
    keys = jax.random.split(key, max(conv_needed, 1))
    n = 0
    for c in VGG19_CFG:
        if c == "M":
            continue
        if n >= conv_needed:
            break
        params.append({
            "w": finit.kaiming_normal(keys[n], (3, 3, in_ch, c), mode="fan_out", nonlinearity="relu"),
            "b": finit.zeros((c,)),
        })
        in_ch = c
        n += 1
    return params


def max_pool2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def extract_features(
    params: List[Dict[str, jax.Array]],
    x: jax.Array,
    layer_indices: Sequence[int],
    normalize: bool = True,
) -> Dict[int, jax.Array]:
    """Run the features stack, capturing outputs at the given torchvision
    indices. x: NHWC in [0, 1]."""
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std

    wanted = set(int(i) for i in layer_indices)
    if not wanted:
        raise ValueError(
            "extract_features needs at least one layer index (empty "
            "perceptual_layers? drop the perceptual term instead)")
    max_idx = max(wanted)
    feats: Dict[int, jax.Array] = {}
    for idx, kind, conv_no in module_sequence():
        if idx > max_idx:
            break
        if kind == "conv":
            p = params[conv_no]
            x = conv2d(x, p["w"], p["b"], padding=1)
        elif kind == "relu":
            x = jax.nn.relu(x)
        else:
            x = max_pool2(x)
        if idx in wanted:
            feats[idx] = x
    return feats
