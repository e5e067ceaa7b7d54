"""NHWC convolution / activation primitives for TPU.

Thin functional wrappers over `lax.conv_general_dilated` with the TPU-native
(NHWC, HWIO) layouts. Mixed precision: pass `dtype=jnp.bfloat16` to run the
conv on the MXU in bf16 with float32 accumulation (`preferred_element_type`),
which replaces the reference's CUDA AMP GradScaler path
(`src/training/trainer.py:227` — bf16 on TPU needs no loss scaling).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["conv2d", "quantize_act", "prelu", "leaky_relu", "global_avg_pool",
           "dense"]

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: str | int = "SAME",
    feature_group_count: int = 1,
    dtype=None,
) -> jax.Array:
    """2-D convolution, NHWC x HWIO -> NHWC.

    `padding` of int k means symmetric spatial padding of k (PyTorch
    `padding=k`); "SAME" matches PyTorch's `padding=kernel//2` for odd
    kernels at stride 1.
    """
    if isinstance(w, dict):
        if "fq" in w:
            # QAT latent kernel {"fq": float HWIO}: differentiable fake
            # quantization on the serving int8 grid (STE rounding).
            return _conv2d_fakequant(x, w, b, stride, padding,
                                     feature_group_count, dtype)
        # int8-quantized kernel {"q": int8 HWIO, "scale": f32 per-out-ch}:
        # the full-int8 serving path (weights AND activations on the MXU's
        # native s8 pipe — measured 2x the bf16 conv rate on v5e, BENCH.md).
        return _conv2d_int8(x, w, b, stride, padding, feature_group_count, dtype)
    if dtype is not None:
        x = x.astype(dtype)
    w = w.astype(x.dtype)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    # No preferred_element_type upcast: XLA:TPU accumulates bf16 convs in
    # f32 internally regardless, and a f32 primitive output breaks the
    # conv transpose rule under grad (f32 cotangent vs bf16 operands).
    #
    # Precision: TPU lowers f32 convs to single-pass bf16 by default, which
    # silently breaks f32 semantics (e.g. SSIM's E[x^2]-E[x]^2 cancels
    # catastrophically -> SSIM > 1 observed on hardware). When the caller
    # asked for f32 (dtype None / f32 inputs), honor it with HIGHEST; the
    # bf16 fast path is the explicit dtype=bf16 policy.
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMSPEC,
        feature_group_count=feature_group_count,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _conv2d_int8(
    x: jax.Array,
    w: dict,
    b: Optional[jax.Array],
    stride: int,
    padding,
    feature_group_count: int,
    dtype,
) -> jax.Array:
    """s8 x s8 -> s32 conv with per-tensor activation quantization.

    out = conv(round(x/a), q) * (a * w_scale) + b. The scale `a` is either
    static (w["a"], produced by `facesr.ops.quant.calibrate_act_scales` —
    no reduction in the forward, so XLA fuses the quantize into the
    producer's epilogue) or dynamic, a = max|x|/127 computed on the fly
    (no calibration pass; the classic per-channel-weight /
    per-tensor-activation scheme). Output returns in x's float dtype."""
    if x.dtype == jnp.int8:
        # Pre-quantized input: the producer already applied THIS conv's
        # static scale (blocks.upsample quantizes before the depth-to-space
        # permutation so the shuffle copy moves int8 — 4x less HBM).
        if "a" not in w:
            raise ValueError("int8 conv input requires a static scale "
                             "(calibrated kernel dict with 'a')")
        a = w["a"]
        xq = x
        out_dtype = dtype if dtype is not None else jnp.float32
    else:
        if dtype is not None:
            x = x.astype(dtype)
        out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
        xf = x.astype(jnp.float32)
        if "a" in w:
            # Calibrated static scale: [1,1,1,1] after scan slicing,
            # broadcasts over NHWC. Out-of-range serving activations
            # saturate at +-127 — the standard static-quantization trade,
            # quality-gated in tests.
            a = w["a"]
        else:
            # Per-IMAGE scales (not per-batch): each image's quantization
            # grid must not depend on its batchmates (deterministic serving
            # regardless of chunk composition), and the reduction stays
            # shard-local under batch-sharded multi-chip serving (a
            # whole-tensor max would insert an all-reduce before every
            # conv).
            a = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
            a = jnp.where(a == 0, 1.0, a)
            from facesr.ops import quant as _quant

            _quant.maybe_record_act_scale(w, a)
        xq = quantize_act(xf, a)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = padding
    y = lax.conv_general_dilated(
        xq,
        w["q"],
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DIMSPEC,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (a * w["scale"].reshape(1, 1, 1, -1))
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(out_dtype)


def _ste_round(v: jax.Array) -> jax.Array:
    """round() with a straight-through gradient (d/dv == 1): the standard
    QAT estimator — the quantizer's staircase has zero gradient almost
    everywhere, so training treats it as identity."""
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def _conv2d_fakequant(
    x: jax.Array,
    w: dict,
    b: Optional[jax.Array],
    stride: int,
    padding,
    feature_group_count: int,
    dtype,
) -> jax.Array:
    """Differentiable mirror of `_conv2d_int8` for quantization-aware
    training: out = conv(fq(x), fq(w)) + b where fq snaps values onto the
    int8 serving grid (same per-output-channel weight scales, same
    per-image dynamic activation scales, same round/clip) but keeps them
    float, with straight-through gradients to the latent params.

    Because the per-image scale `a` is constant over the contraction axes
    and the per-channel scale `s` is constant per output, the float conv of
    the snapped values equals the integer path's s32 accumulation * (a*s)
    up to float rounding. The conv itself runs in the policy dtype (bf16
    under training — QAT needs the quantization *grid*, not integer-exact
    accumulation; pass dtype=None for the f32 parity path tests use).
    Scales are stop_gradient'd (the standard abs-max STE scheme).
    """
    if dtype is not None:
        x = x.astype(dtype)
    out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32

    wf = w["fq"].astype(jnp.float32)
    s = jax.lax.stop_gradient(
        jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True) / 127.0
    )
    s = jnp.where(s == 0, 1.0, s)
    wq = jnp.clip(_ste_round(wf / s), -127, 127) * s

    xf = x.astype(jnp.float32)
    if "a" in w:
        # calibrated static serving grid: same scale the deployed int8_full
        # path uses, including its saturation at +-127 (the clip's zero
        # gradient outside the range pushes training back inside it)
        a = w["a"]
    else:
        a = jax.lax.stop_gradient(
            jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
        )
        a = jnp.where(a == 0, 1.0, a)
    xq = jnp.clip(_ste_round(xf / a), -127, 127) * a

    return conv2d(
        xq.astype(out_dtype), wq.astype(out_dtype), b,
        stride=stride, padding=padding,
        feature_group_count=feature_group_count, dtype=None,
    )


def quantize_act(x: jax.Array, a: jax.Array) -> jax.Array:
    """Quantize activations to s8 with scale `a` (the int8 conv's input
    grid): round(x/a) clipped to [-127, 127]. Exposed so producers can
    quantize BEFORE a pure permutation (pixel shuffle) — per-tensor
    quantization commutes with permutations, and moving it keeps the copy
    in int8 and lets XLA fuse the sweep into the producer's epilogue."""
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf / a), -127, 127).astype(jnp.int8)


def prelu(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Per-channel PReLU; alpha shape [C], x NHWC."""
    a = alpha.astype(x.dtype)
    return jnp.where(x >= 0, x, a * x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, negative_slope * x)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC -> [N, C] global average pool (SE squeeze)."""
    return x.mean(axis=(1, 2))


def dense(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None, dtype=None) -> jax.Array:
    """[N, in] x [in, out] -> [N, out]."""
    if dtype is not None:
        x = x.astype(dtype)
    out = jnp.dot(
        x, w.astype(x.dtype),
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None),
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
