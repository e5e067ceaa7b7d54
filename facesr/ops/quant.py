"""Per-channel int8 weight quantization for serving.

Weight-only quantization: conv/dense kernels are stored int8 with one f32
scale per output channel (last axis of the HWIO/[in,out] layouts) and
dequantized to the activation dtype inside the jitted forward — XLA fuses
the dequant into the conv's weight read, so HBM holds (and streams) 4x
smaller weights while the MXU math stays bf16. For this 4.9M-param model
the win is footprint, not FLOPs; the path exists behind
`ShardedPredictor(dtype="int8")` and is quality-gated by tests comparing
PSNR/SSIM against the bf16 output (CLAUDE.md round-2 agenda; real-data
validation pending real weights).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_pytree", "dequantize_pytree", "quantize_conv_kernels",
           "quantization_summary"]

# Leaves smaller than this stay f32: per-channel scales on tiny tensors
# (PReLU alphas, biases, SE bottlenecks) cost accuracy for ~no footprint.
MIN_QUANT_SIZE = 256


def _quantizable(leaf: jax.Array) -> bool:
    return (leaf.ndim >= 2 and leaf.size >= MIN_QUANT_SIZE
            and leaf.dtype in (jnp.float32, jnp.bfloat16))


def quantize_pytree(params: Any) -> Tuple[Any, Any]:
    """(q_tree, scale_tree): int8 leaves + per-output-channel scales.

    Non-quantizable leaves pass through unchanged with a scalar 1.0 scale
    so both trees keep the params structure (jit-friendly)."""
    def qs(leaf):
        leaf = jnp.asarray(leaf)
        if not _quantizable(leaf):
            return leaf, jnp.asarray(1.0, jnp.float32)
        f = leaf.astype(jnp.float32)
        axes = tuple(range(leaf.ndim - 1))
        scale = jnp.max(jnp.abs(f), axis=axes, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
        return q, scale

    pairs = jax.tree.map(qs, params)
    return (jax.tree.map(lambda p: p[0], pairs, is_leaf=lambda n: isinstance(n, tuple)),
            jax.tree.map(lambda p: p[1], pairs, is_leaf=lambda n: isinstance(n, tuple)))


def quantize_conv_kernels(params: Any) -> Any:
    """Full-int8 serving transform: conv kernel leaves become
    {"q": int8, "scale": f32} dicts that `facesr.ops.conv2d` dispatches to
    the s8xs8->s32 conv path (dynamic per-tensor activation scales computed
    in the forward). Non-conv leaves (biases, PReLU, SE fc matrices) pass
    through — XLA runs those in the surrounding float policy. Measured 2x
    the bf16 conv rate on v5e (BENCH.md); inference only.

    Conv kernels are identified by the facesr layout: float leaves with
    >= 4 dims (trailing [kh, kw, I, O]; scan-stacked kernels carry extra
    leading [G]/[G, B] axes) outside any `ca`/`fc*` path. Scales are per
    output channel with keepdims on the leading stack axes, so lax.scan
    slices q and scale together."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
        in_attention = any(k == "ca" or k.startswith("fc") for k in keys)
        leaf = jnp.asarray(leaf)
        if (in_attention or leaf.ndim < 4 or leaf.size < MIN_QUANT_SIZE
                or leaf.dtype not in (jnp.float32, jnp.bfloat16)):
            out.append(leaf)
            continue
        f = leaf.astype(jnp.float32)
        axes = tuple(range(leaf.ndim - 4, leaf.ndim - 1))  # kh, kw, I
        scale = jnp.max(jnp.abs(f), axis=axes, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale)
        out.append({
            "q": jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8),
            "scale": scale,
        })
    return treedef.unflatten(out)


def dequantize_pytree(q_tree: Any, scale_tree: Any, dtype=jnp.bfloat16) -> Any:
    """Rebuild a params pytree in `dtype`; int8 leaves scale back, float
    leaves pass through (their dtype is handled by the model's policy)."""
    def deq(q, s):
        if q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        return q

    return jax.tree.map(deq, q_tree, scale_tree)


def quantization_summary(q_tree: Any) -> dict:
    leaves = jax.tree.leaves(q_tree)
    q_bytes = sum(l.size for l in leaves if l.dtype == jnp.int8)
    f_bytes = sum(l.size * l.dtype.itemsize for l in leaves if l.dtype != jnp.int8)
    orig = sum(l.size * 4 for l in leaves)
    return {
        "quantized_leaves": sum(1 for l in leaves if l.dtype == jnp.int8),
        "total_leaves": len(leaves),
        "bytes": q_bytes + f_bytes,
        "bytes_f32": orig,
        "compression": orig / max(q_bytes + f_bytes, 1),
    }
