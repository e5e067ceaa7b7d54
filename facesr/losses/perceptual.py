"""VGG19 perceptual loss (reference src/losses/perceptual.py:107-169).

Functional: `init_perceptual(key, layers)` builds the frozen VGG params
(or accepts converted torchvision weights), `perceptual_loss(params, ...)`
computes the weighted L1/L2 feature distance. The VGG params ride through
the jitted train step as ordinary (non-trainable) inputs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from facesr.models import vgg
from facesr.losses.basic import l1_loss, l2_loss

__all__ = ["init_perceptual", "perceptual_loss", "DEFAULT_LAYERS"]

DEFAULT_LAYERS = ("conv3_4", "conv4_4")

# Remat the VGG sweep in the backward pass (True saves HBM, costs one extra
# VGG forward per step). Module-level so benches can A/B it; the production
# default is re-evaluated against measurements in BENCH.md.
VGG_REMAT = True


def init_perceptual(
    key: jax.Array,
    layers: Sequence[str] = DEFAULT_LAYERS,
    pretrained_params: Optional[List[Dict[str, jax.Array]]] = None,
) -> List[Dict[str, jax.Array]]:
    """VGG19 conv params truncated to the deepest requested layer.

    With pretrained_params=None, converted torchvision weights are loaded
    automatically when available ($FACESR_VGG19_WEIGHTS / bundled
    weights/vgg19.fckpt — the same gating as LPIPS/FID); otherwise the
    fixed-random fallback keeps the loss usable without egress (values
    then differ from the reference's pretrained perceptual loss)."""
    max_idx = max(vgg.LAYER_MAP[l] for l in layers)
    if pretrained_params is None:
        pretrained_params = vgg.load_vgg19_weights()
    if pretrained_params is not None:
        needed = vgg.num_convs_needed(max_idx)
        if len(pretrained_params) < needed:
            raise ValueError(
                f"VGG19 weights have {len(pretrained_params)} convs but the "
                f"requested layers need {needed} — corrupt/truncated "
                f"conversion?")
        return pretrained_params[:needed]
    return vgg.init_vgg19(key, max_index=max_idx)


def perceptual_loss(
    vgg_params: List[Dict[str, jax.Array]],
    pred: jax.Array,
    target: jax.Array,
    layers: Sequence[str] = DEFAULT_LAYERS,
    weights: Optional[Dict[str, float]] = None,
    criterion: str = "l1",
    normalize: bool = True,
    dtype=None,
    remat: Optional[bool] = None,
) -> jax.Array:
    """Weighted feature-matching distance over the named VGG layers.

    pred/target: NHWC in [0, 1]. The target branch is wrapped in
    stop_gradient (the reference's frozen extractor never backprops into
    targets). `dtype` sets the sweep's compute precision (bf16 under the
    trainer's mixed-precision policy); the feature distance itself reduces
    in f32 either way."""
    if criterion not in ("l1", "l2"):
        # reference PerceptualLoss raises for unknown criteria too
        # (perceptual.py:130-135); a silent L2 fallback would quietly
        # change the loss landscape on a typo
        raise ValueError(f"Unknown perceptual criterion {criterion!r}; "
                         f"use 'l1' or 'l2'")
    dist = lambda a, b: (l1_loss if criterion == "l1" else l2_loss)(
        a.astype(jnp.float32), b.astype(jnp.float32))
    # `weights or ...` would also replace an explicitly-passed empty dict
    # (zero perceptual contribution) with full-strength all-1.0 weights
    weights = weights if weights is not None else {l: 1.0 for l in layers}
    idxs = [vgg.LAYER_MAP[l] for l in layers]
    if dtype is not None:
        pred = pred.astype(dtype)
        target = target.astype(dtype)

    # Remat the VGG sweep: saves HBM at the cost of one extra VGG forward
    # per step. Measured on v5e (BENCH.md): OFF is ~7% faster at batch 128
    # bf16 and still fits; batch >= 160 needs it ON.
    if remat is None:
        remat = VGG_REMAT
    extract = lambda p, x: vgg.extract_features(p, x, idxs, normalize=normalize)
    if remat:
        extract = jax.checkpoint(extract)
    pred_feats = extract(vgg_params, pred)
    # No remat on the target branch: nothing differentiates through it, so
    # wrapping it only risks a pointless recompute.
    target_feats = jax.tree.map(
        jax.lax.stop_gradient,
        vgg.extract_features(vgg_params, jax.lax.stop_gradient(target),
                             idxs, normalize=normalize),
    )

    loss = jnp.asarray(0.0, jnp.float32)
    for name, idx in zip(layers, idxs):
        loss = loss + weights.get(name, 1.0) * dist(pred_feats[idx], target_feats[idx])
    return loss
