"""Pallas TPU kernel: fused residual group (N RCABs + tail conv).

Motivation (measured on v5e-1, batch 32, 6x10x64 model): the XLA path runs
at ~27 ms/batch while pure-compute ideal is ~7 ms and the MXU ceiling with
64 output channels is ~15 ms — the gap is HBM traffic, since every RCAB
round-trips the 64x64x64 feature map through HBM several times (conv1,
conv2, SE, residual). This kernel keeps the feature map in VMEM across the
whole residual group (reference semantics: blocks.py:156-189 — N RCABs,
tail conv3x3, group skip), reading each image once and writing once.

Implementation notes:
  - grid over the batch dimension; one image's features live in VMEM
    (64x64x64 f32 = 1 MB) together with all N RCABs' weights (~1.5 MB bf16).
  - 3x3 SAME convs run as 3 matmuls (one per kernel row dy): a zero-padded
    bf16 copy of the features is sliced at the 3 dx offsets into a
    [H*W, 3C] patch matrix, contracted with the [3C, C] weight slice on the
    MXU with f32 accumulation. K=192 keeps the MXU efficient while the
    patch scratch stays at 1.6 MB (a single [H*W, 9C] patch matrix blows
    the 16 MB scoped-VMEM cap once pipeline double-buffering is counted).
  - SE attention, PReLU, residual adds are VPU element-wise ops fused in.
  - weights are passed pre-reshaped: conv [3,3,Cin,Cout] -> [3, 3*Cin, Cout]
    (row index dx*Cin + cin matches the patch column layout).

VMEM at H=W=64, C=64, N=10: patches 1.6 MB + padded (bf16) 0.55 MB +
feat/acc 2 MB + IO blocks 4 MB + weights ~3 MB + temps  ->  ~12 MB < 16 MB.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_residual_group", "prepare_group_weights", "supports"]


def supports(h: int, w: int, c: int, num_blocks: int = 10,
             vmem_budget: int = 13 * 1024 * 1024) -> bool:
    """Whether the fused kernel fits the scoped-VMEM cap for this shape."""
    patches = h * w * 3 * c * 2
    padded = (h + 2) * (w + 2) * c * 2
    feat_acc = 2 * h * w * c * 4
    io = 4 * h * w * c * 4
    weights = 2 * num_blocks * 9 * c * c * 2 * 2
    return patches + padded + feat_acc + io + weights < vmem_budget


def prepare_group_weights(gp: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Reshape one group's stacked params into the kernel's matmul layout:
    convs [B, 3, 3, C, C] -> [B, 3, 3C, C] (per-dy row-slices)."""
    rc = gp["rcab"]
    c = rc["conv1_w"].shape[-1]

    def to_mat(w):
        if w.ndim == 5:  # [B, 3, 3, C, C]
            return w.reshape(w.shape[0], 3, 3 * c, c)
        return w.reshape(3, 3 * c, c)

    return {
        "w1": to_mat(rc["conv1_w"]).astype(jnp.bfloat16),
        "b1": rc["conv1_b"].astype(jnp.float32),
        "a": rc["prelu_a"].astype(jnp.float32),
        "w2": to_mat(rc["conv2_w"]).astype(jnp.bfloat16),
        "b2": rc["conv2_b"].astype(jnp.float32),
        "fc1": gp["rcab"]["ca"]["fc1_w"].astype(jnp.float32),
        "fc2": gp["rcab"]["ca"]["fc2_w"].astype(jnp.float32),
        "wg": to_mat(gp["conv_w"]).astype(jnp.bfloat16),
        "bg": gp["conv_b"].astype(jnp.float32),
    }


def _group_kernel(
    x_ref, w1_ref, b1_ref, a_ref, w2_ref, b2_ref, fc1_ref, fc2_ref,
    wg_ref, bg_ref, out_ref,
    feat_ref, padded_ref, patches_ref,
    *, num_blocks: int, h: int, w: int, c: int, res_scale: float,
):
    hw = h * w

    def pad_in(src_hw_c):
        """Write [HW, C] values into the zero-padded bf16 buffer."""
        padded_ref[:] = jnp.zeros_like(padded_ref)
        padded_ref[1:h + 1, 1:w + 1, :] = (
            src_hw_c.reshape(h, w, c).astype(jnp.bfloat16)
        )

    def conv3x3(w_dyn):
        """SAME 3x3 conv of the current padded buffer; w_dyn: [3, 3C, C]."""
        total = None
        for dy in range(3):
            for dx in range(3):
                patches_ref[:, dx * c:(dx + 1) * c] = (
                    padded_ref[dy:dy + h, dx:dx + w, :].reshape(hw, c)
                )
            m = jnp.dot(patches_ref[:], w_dyn[dy],
                        preferred_element_type=jnp.float32)
            total = m if total is None else total + m
        return total

    feat_ref[:] = x_ref[0].reshape(hw, c).astype(jnp.float32)

    def rcab_body(k, _):
        pad_in(feat_ref[:])
        out = conv3x3(w1_ref[k]) + b1_ref[k]
        a = a_ref[k]
        out = jnp.where(out >= 0, out, a * out)  # PReLU
        pad_in(out)
        out = conv3x3(w2_ref[k]) + b2_ref[k]
        # SE channel attention: squeeze (mean over HW) -> 2 FCs -> scale
        y = out.mean(axis=0, keepdims=True)  # [1, C]
        y = jax.nn.relu(jnp.dot(y, fc1_ref[k], preferred_element_type=jnp.float32))
        y = jax.nn.sigmoid(jnp.dot(y, fc2_ref[k], preferred_element_type=jnp.float32))
        feat_ref[:] = feat_ref[:] + out * y * res_scale
        return 0

    lax.fori_loop(0, num_blocks, rcab_body, 0)

    # group tail conv + group skip (original input)
    pad_in(feat_ref[:])
    tail = conv3x3(wg_ref[:]) + bg_ref[:]
    out_ref[0] = (tail + x_ref[0].reshape(hw, c).astype(jnp.float32)
                  ).reshape(h, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("res_scale", "interpret"))
def fused_residual_group(
    x: jax.Array,
    gw: Dict[str, jax.Array],
    res_scale: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """One residual group over NHWC features via the fused Pallas kernel.

    x: [N, H, W, C]; gw: prepare_group_weights output for this group.
    """
    n, h, w, c = x.shape
    num_blocks = gw["w1"].shape[0]
    cr = gw["fc1"].shape[-1]
    hw = h * w

    full = lambda s: pl.BlockSpec(s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _group_kernel, num_blocks=num_blocks, h=h, w=w, c=c, res_scale=res_scale
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            full((num_blocks, 3, 3 * c, c)),
            full((num_blocks, c)),
            full((num_blocks, c)),
            full((num_blocks, 3, 3 * c, c)),
            full((num_blocks, c)),
            full((num_blocks, c, cr)),
            full((num_blocks, cr, c)),
            full((3, 3 * c, c)),
            full((c,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((hw, c), jnp.float32),            # feat accumulator
            pltpu.VMEM((h + 2, w + 2, c), jnp.bfloat16),  # padded conv input
            pltpu.VMEM((hw, 3 * c), jnp.bfloat16),       # per-dy patches
        ],
        interpret=interpret,
    )(x, gw["w1"], gw["b1"], gw["a"], gw["w2"], gw["b2"],
      gw["fc1"], gw["fc2"], gw["wg"], gw["bg"])
