"""Pallas TPU kernel: fused residual group (N RCABs + tail conv).

STATUS — experimental, NOT the default path. Measured on v5e-1 (batch 32,
6x10x64 model): this kernel reaches 632-641 img/s vs 1184 img/s for the
XLA lowering of the same group. The hypothesis that HBM round-trips
between RCAB ops dominate did not hold: XLA already fuses the elementwise
epilogues and, crucially, batches all N images into one conv GEMM
(M = N*H*W = 131k rows) while this kernel's per-image grid steps cap
M at H*W/4 = 1k-4k rows, underutilizing the MXU pipeline. Kept in-tree as
a correctness-tested baseline for future per-image-fusion work (e.g.
multi-image blocks or megacore partitioning); `supports()` gates it and
the model default remains the scanned XLA path.

Original motivation: keep the feature map in VMEM across the whole
residual group (reference semantics: blocks.py:156-189 — N RCABs,
tail conv3x3, group skip), reading each image once and writing once.

Implementation notes:
  - grid over the batch dimension; one image's features live in VMEM
    together with all N RCABs' weights (~1.5 MB bf16).
  - 3x3 SAME convs run as row-chunked matmuls: for each chunk of CH image
    rows and each kernel row dy, a [CH*W, 3C] bf16 patch tile (3 dx shifts
    of the zero-padded feature buffer) is contracted with the [3C, C]
    weight slice on the MXU with f32 accumulation (K=192 keeps the MXU
    efficient; small tiles keep Mosaic's scoped-VMEM stack under the 16 MB
    cap, which a whole-image [HW, 9C] patch matrix blows once pipeline
    double-buffering is counted).
  - SE attention, PReLU, residual adds are VPU element-wise ops fused in.
  - kernel I/O is bf16 (same precision policy as the bf16 XLA trunk);
    the group-residual accumulator stays f32 in VMEM.
  - weights are passed pre-reshaped: conv [3,3,Cin,Cout] -> [3, 3*Cin, Cout]
    (row index dx*Cin + cin matches the patch column layout).
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

_CHUNK_ROWS = 16  # image rows per conv matmul tile


def supports(h: int, w: int, c: int, num_blocks: int = 10,
             vmem_budget: int = 12 * 1024 * 1024) -> bool:
    """Whether the fused kernel fits the scoped-VMEM cap for this shape."""
    if c % 8 != 0:
        return False
    if h % _CHUNK_ROWS != 0 and h > _CHUNK_ROWS:
        return False
    feat_acc = 2 * h * w * c * 4
    padded = (h + 2) * (w + 2) * c * 2
    patches = _CHUNK_ROWS * w * 3 * c * 2
    io = 4 * h * w * c * 2
    weights = 2 * num_blocks * 9 * c * c * 2 * 2
    return feat_acc + padded + patches + io + weights < vmem_budget


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
        "fc1": rc["ca"]["fc1_w"].astype(jnp.float32),
        "fc2": rc["ca"]["fc2_w"].astype(jnp.float32),
        "wg": to_mat(gp["conv_w"]).astype(jnp.bfloat16),
        "bg": gp["conv_b"].astype(jnp.float32),
    }


def _group_kernel(
    x_ref, w1_ref, b1_ref, a_ref, w2_ref, b2_ref, fc1_ref, fc2_ref,
    wg_ref, bg_ref, out_ref,
    feat_ref, acc_ref, padded_ref, patches_ref,
    *, num_blocks: int, h: int, w: int, c: int, res_scale: float,
):
    hw = h * w
    ch = _CHUNK_ROWS if h % _CHUNK_ROWS == 0 else h
    n_chunks = h // ch

    def pad_in(src_ref):
        """Zero-pad an [HW, C] f32 buffer into the bf16 conv-input buffer."""
        padded_ref[:] = jnp.zeros_like(padded_ref)
        padded_ref[1:h + 1, 1:w + 1, :] = (
            src_ref[:].reshape(h, w, c).astype(jnp.bfloat16)
        )

    def conv3x3_into(dst_ref, w_dyn, bias):
        """SAME 3x3 conv of padded_ref -> dst_ref ([HW, C] f32) + bias."""
        def chunk_body(ci, _):
            r0 = ci * ch
            total = jnp.zeros((ch * w, c), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    patches_ref[:, dx * c:(dx + 1) * c] = (
                        padded_ref[pl.ds(dy + r0, ch), dx:dx + w, :]
                        .reshape(ch * w, c)
                    )
                total = total + jnp.dot(patches_ref[:], w_dyn[dy],
                                        preferred_element_type=jnp.float32)
            dst_ref[pl.ds(r0 * w, ch * w), :] = total + bias
            return 0

        lax.fori_loop(0, n_chunks, chunk_body, 0)

    feat_ref[:] = x_ref[0].reshape(hw, c).astype(jnp.float32)

    def rcab_body(k, _):
        pad_in(feat_ref)
        conv3x3_into(acc_ref, w1_ref[k], b1_ref[k])
        a = a_ref[k]
        acc_ref[:] = jnp.where(acc_ref[:] >= 0, acc_ref[:], a * acc_ref[:])  # PReLU
        pad_in(acc_ref)
        conv3x3_into(acc_ref, w2_ref[k], b2_ref[k])
        # SE channel attention: squeeze (mean over HW) -> 2 FCs -> scale
        y = acc_ref[:].mean(axis=0, keepdims=True)  # [1, C]
        y = jax.nn.relu(jnp.dot(y, fc1_ref[k], preferred_element_type=jnp.float32))
        y = jax.nn.sigmoid(jnp.dot(y, fc2_ref[k], preferred_element_type=jnp.float32))
        feat_ref[:] = feat_ref[:] + acc_ref[:] * y * res_scale
        return 0

    lax.fori_loop(0, num_blocks, rcab_body, 0)

    # group tail conv + group skip (original input)
    pad_in(feat_ref)
    conv3x3_into(acc_ref, wg_ref, bg_ref[:])
    out_ref[0] = (acc_ref[:] + x_ref[0].reshape(hw, c).astype(jnp.float32)
                  ).reshape(h, w, c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("res_scale", "interpret"))
def fused_residual_group(
    x: jax.Array,
    gw: Dict[str, jax.Array],
    res_scale: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """One residual group over NHWC features via the fused Pallas kernel.

    x: [N, H, W, C] (any float dtype; kernel I/O is bf16);
    gw: prepare_group_weights output for this group.
    """
    n, h, w, c = x.shape
    num_blocks = gw["w1"].shape[0]
    cr = gw["fc1"].shape[-1]
    hw = h * w
    orig_dtype = x.dtype

    full = lambda s: pl.BlockSpec(s, lambda b: (0,) * len(s), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _group_kernel, num_blocks=num_blocks, h=h, w=w, c=c, res_scale=res_scale
    )
    out = pl.pallas_call(
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
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((hw, c), jnp.float32),              # feat accumulator
            pltpu.VMEM((hw, c), jnp.float32),              # conv output
            pltpu.VMEM((h + 2, w + 2, c), jnp.bfloat16),   # padded conv input
            pltpu.VMEM(((_CHUNK_ROWS if h % _CHUNK_ROWS == 0 else h) * w, 3 * c),
                       jnp.bfloat16),  # patch tile
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), gw["w1"], gw["b1"], gw["a"], gw["w2"], gw["b2"],
      gw["fc1"], gw["fc2"], gw["wg"], gw["bg"])
    return out.astype(orig_dtype)
