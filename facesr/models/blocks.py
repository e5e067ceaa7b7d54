"""FaceEnhanceNet building blocks, TPU-first functional design.

Instead of translating the reference's nn.Module tree
(`/root/reference/src/models/blocks.py`), blocks are pure functions over
parameter pytrees, and the repeated RCAB blocks are *stacked* along leading
axes ([num_groups, blocks_per_group, ...]) and driven by `jax.lax.scan`.
This keeps XLA compile time flat in network depth (the production model is
6 groups x 10 RCABs = 60 blocks — reference
`configs/stages/stage1_psnr_config.yaml:32-37`) while the MXU still sees
full-size convolutions.

Parity targets (behavior, not code):
  - ChannelAttention (SE): global-avg-pool -> FC(C -> max(C/r, 8), no bias)
    -> ReLU -> FC(-> C, no bias) -> sigmoid -> scale
    (reference blocks.py:44-92)
  - RCAB: conv3x3 -> PReLU -> conv3x3 -> CA -> * res_scale + skip
    (reference blocks.py:95-153)
  - ResidualGroup: N RCABs -> conv3x3 -> + group skip (blocks.py:156-189)
  - PixelShuffleUpsample: conv C -> C*s^2 (ICNR) -> PixelShuffle -> PReLU
    (blocks.py:192-227)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from facesr.ops import conv2d, prelu, pixel_shuffle
from facesr.ops import init as finit

Params = Dict[str, Any]


def reduced_channels(num_channels: int, reduction_ratio: int) -> int:
    """SE bottleneck width: max(C // r, 8) (reference blocks.py:62)."""
    return max(num_channels // reduction_ratio, 8)


# ---------------------------------------------------------------------------
# Channel attention
# ---------------------------------------------------------------------------

def init_channel_attention(key: jax.Array, num_channels: int, reduction_ratio: int) -> Params:
    cr = reduced_channels(num_channels, reduction_ratio)
    k1, k2 = jax.random.split(key)
    # Reference model init overrides these Linears with kaiming fan_out/relu
    # (custom.py:129-139); dense kernels stored [in, out].
    return {
        "fc1_w": finit.kaiming_normal(k1, (num_channels, cr), mode="fan_out", nonlinearity="relu"),
        "fc2_w": finit.kaiming_normal(k2, (cr, num_channels), mode="fan_out", nonlinearity="relu"),
    }


def channel_attention(p: Params, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """SE gating. Returns (gated tensor, attention weights [N, C])."""
    from jax.ad_checkpoint import checkpoint_name

    # Named so a remat policy can keep the TINY squeeze/gate tensors
    # ([N, C] — a few MB across the whole trunk) and skip recomputing the
    # global-mean reduce over the full feature map during the backward
    # sweep (measured ~11% of the stage-1 step — BENCH.md round 2 trace).
    y = checkpoint_name(x.mean(axis=(1, 2)), "ca_squeeze")
    y = jax.nn.relu(jnp.dot(y, p["fc1_w"].astype(y.dtype)))
    y = checkpoint_name(
        jax.nn.sigmoid(jnp.dot(y, p["fc2_w"].astype(y.dtype))), "ca_gate")
    return x * y[:, None, None, :], y


# ---------------------------------------------------------------------------
# RCAB
# ---------------------------------------------------------------------------

def init_rcab(key: jax.Array, num_channels: int, kernel_size: int, reduction_ratio: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (kernel_size, kernel_size, num_channels, num_channels)
    return {
        "conv1_w": finit.kaiming_normal(k1, shape, mode="fan_out", nonlinearity="relu"),
        "conv1_b": finit.zeros((num_channels,)),
        "prelu_a": finit.prelu_init(num_channels),
        "conv2_w": finit.kaiming_normal(k2, shape, mode="fan_out", nonlinearity="relu"),
        "conv2_b": finit.zeros((num_channels,)),
        "ca": init_channel_attention(k3, num_channels, reduction_ratio),
    }


def rcab(p: Params, x: jax.Array, res_scale: float, padding: int) -> Tuple[jax.Array, jax.Array]:
    """One residual channel-attention block. Returns (out, attention [N, C])."""
    from jax.ad_checkpoint import checkpoint_name

    out = conv2d(x, p["conv1_w"], p["conv1_b"], padding=padding)
    # Names let a selective remat policy keep exactly the conv outputs (the
    # expensive ops) while recomputing the cheap elementwise tail; they are
    # inert without an enclosing jax.checkpoint policy.
    out = checkpoint_name(out, "rcab_conv1")
    out = prelu(out, p["prelu_a"])
    out = conv2d(out, p["conv2_w"], p["conv2_b"], padding=padding)
    out = checkpoint_name(out, "rcab_conv2")
    out, attn = channel_attention(p["ca"], out)
    return x + out * jnp.asarray(res_scale, out.dtype), attn


# ---------------------------------------------------------------------------
# Residual groups (stacked + scanned)
# ---------------------------------------------------------------------------

def init_residual_groups(
    key: jax.Array,
    num_groups: int,
    blocks_per_group: int,
    num_channels: int,
    kernel_size: int,
    reduction_ratio: int,
) -> Params:
    """Stacked params: every leaf has leading dims [num_groups, blocks_per_group]
    (RCAB leaves) or [num_groups] (group-tail conv)."""
    n = num_groups * blocks_per_group
    rcab_keys = jax.random.split(key, n + num_groups + 1)
    rcabs = [
        init_rcab(rcab_keys[i], num_channels, kernel_size, reduction_ratio)
        for i in range(n)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rcabs)
    stacked = jax.tree.map(
        lambda a: a.reshape((num_groups, blocks_per_group) + a.shape[1:]), stacked
    )
    conv_shape = (kernel_size, kernel_size, num_channels, num_channels)
    convs_w = jnp.stack(
        [
            finit.kaiming_normal(rcab_keys[n + g], conv_shape, mode="fan_out", nonlinearity="relu")
            for g in range(num_groups)
        ]
    )
    return {
        "rcab": stacked,
        "conv_w": convs_w,
        "conv_b": jnp.zeros((num_groups, num_channels)),
    }


def residual_groups(
    p: Params,
    x: jax.Array,
    res_scale: float,
    padding: int,
    collect_attention: bool = False,
    remat: str = "rcab",
) -> Tuple[jax.Array, jax.Array | None]:
    """Scan over groups; each group scans over its RCABs then applies the
    group-tail conv + group skip (reference blocks.py:185-189).

    remat selects the backward-pass memory/FLOPs trade for the trunk:
      - "rcab": rematerialize every RCAB — only the per-block scan carry is
        kept; the block recomputes during the gradient sweep. Cheapest HBM
        (required for batch 128 f32), most recompute.
      - "save_convs": keep each RCAB's two conv outputs (the expensive
        ops), recompute only the cheap elementwise tail. ~3x the trunk HBM
        of "rcab", near-zero conv recompute.
      - "none": let XLA keep whatever backward needs (fastest, most HBM).

    Returns (features, attention maps [G, B, N, C] if requested else None).
    """

    def rcab_body(h, rp):
        h, attn = rcab(rp, h, res_scale, padding)
        return h, (attn if collect_attention else None)

    if remat == "rcab":
        rcab_body = jax.checkpoint(rcab_body)
    elif remat == "save_ca":
        # Like "rcab" but keeps the SE squeeze/gate ([N, C] — tiny): the
        # backward replay skips the global-mean reduce over the full
        # feature map, the most expensive non-conv op in the recompute
        # (BENCH.md round-2 trace: ~11% of the stage-1 step).
        rcab_body = jax.checkpoint(
            rcab_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "ca_squeeze", "ca_gate"
            ),
        )
    elif remat == "save_convs":
        rcab_body = jax.checkpoint(
            rcab_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "rcab_conv1", "rcab_conv2"
            ),
        )
    elif remat != "none":
        raise ValueError(f"Unknown remat mode: {remat!r}")

    def group_body(feat, gp):
        res = feat
        feat, attns = lax.scan(rcab_body, feat, gp["rcab"])
        feat = conv2d(feat, gp["conv_w"], gp["conv_b"], padding=padding)
        return feat + res, attns

    out, attns = lax.scan(group_body, x, p)
    return out, attns


# ---------------------------------------------------------------------------
# Upsampling
# ---------------------------------------------------------------------------

def init_upsample(key: jax.Array, num_channels: int, scale_factor: int) -> list[Params]:
    """log2(scale) cascaded 2x PixelShuffle stages (reference blocks.py:230-263).

    Stage params are kept as a Python list (static length; spatial shapes
    differ per stage so scanning is not applicable)."""
    num_stages = int(math.log2(scale_factor))
    assert 2 ** num_stages == scale_factor, "scale_factor must be a power of 2"
    keys = jax.random.split(key, num_stages)
    stages = []
    for s in range(num_stages):
        stages.append(
            {
                "conv_w": finit.icnr(keys[s], (3, 3, num_channels, num_channels * 4), scale_factor=2),
                "conv_b": finit.zeros((num_channels * 4,)),
                "prelu_a": finit.prelu_init(num_channels),
            }
        )
    return stages


def upsample(stages: list[Params], x: jax.Array, next_w=None,
             keep_last_packed: bool = False) -> jax.Array:
    """Cascaded conv -> PixelShuffle(2) -> PReLU stages.

    `next_w` is the kernel that will consume the result (conv_last). In
    int8 serving with calibrated static scales, each stage applies the
    PReLU in PACKED layout (alpha tiled 4x — the shuffle maps packed
    channel c*4+dy*2+dx to channel c, facesr.ops.pixel_shuffle) and
    quantizes to the CONSUMER's grid before the depth-to-space permutation.
    Exactly equivalent (per-tensor quantize and per-channel PReLU commute
    with the permutation) but the shuffle copy moves int8 instead of bf16
    and the quantize sweep fuses into this conv's epilogue — the upsample
    tail was the biggest non-trunk HBM cost in the serving trace (BENCH.md
    round 2).

    With `keep_last_packed=True` (int8 path only) the FINAL depth-to-space
    is skipped entirely and the s8 tensor is returned in packed layout —
    the caller consumes it with a subpixel-packed conv_last
    (facesr.ops.pixel_shuffle.subpixel_pack_kernel) and shuffles the
    3-channel result instead, eliminating the full-size feature-map
    transpose copies (~17% of the serving step in the round-2 trace)."""
    from facesr.ops.conv import quantize_act
    from facesr.ops.quant import is_int8_kernel

    for i, sp in enumerate(stages):
        y = conv2d(x, sp["conv_w"], sp["conv_b"], padding=1)
        nxt = stages[i + 1]["conv_w"] if i + 1 < len(stages) else next_w
        if is_int8_kernel(nxt) and jnp.issubdtype(y.dtype, jnp.floating):
            y = prelu(y, jnp.repeat(sp["prelu_a"], 4))
            y = quantize_act(y, nxt["a"])
            if keep_last_packed and i + 1 == len(stages):
                return y  # packed s8 [N, H, W, 4C]
            x = pixel_shuffle(y, 2)
        else:
            x = pixel_shuffle(y, 2)
            x = prelu(x, sp["prelu_a"])
    return x
