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

import contextlib
from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["quantize_pytree", "dequantize_pytree", "quantize_conv_kernels",
           "quantization_summary", "collecting_act_stats", "attach_act_scales",
           "calibrate_act_scales", "fake_quant_params", "is_int8_kernel"]


def is_int8_kernel(w) -> bool:
    """True for a CALIBRATED int8 serving kernel `{"q", "scale", "a"}` —
    the predicate the packed-layout / subpixel serving rewrites key on;
    both requirements are load-bearing: the rewrites read `w["q"]` (to
    repack the integer kernel) AND `w["a"]` (to quantize the producer onto
    this conv's static grid). Dynamic-scale dicts (no "a") and QAT
    `{"fq"[, "a"]}` dicts take the plain paths."""
    return isinstance(w, dict) and "q" in w and "a" in w

# Leaves smaller than this stay f32: per-channel scales on tiny tensors
# (PReLU alphas, biases, SE bottlenecks) cost accuracy for ~no footprint.
MIN_QUANT_SIZE = 256


def _is_conv_kernel(path, leaf) -> bool:
    """Shared site predicate for the int8 serving transform and the QAT
    fake-quant transform — the two MUST select identical leaves so training
    simulates exactly the kernels serving will quantize.

    Conv kernels are float leaves with >= 4 dims (trailing [kh, kw, I, O];
    scan-stacked kernels carry extra leading [G]/[G, B] axes) outside any
    `ca`/`fc*` (channel-attention) path."""
    keys = [str(getattr(p, "key", getattr(p, "idx", ""))) for p in path]
    if any(k == "ca" or k.startswith("fc") for k in keys):
        return False
    return (leaf.ndim >= 4 and leaf.size >= MIN_QUANT_SIZE
            and leaf.dtype in (jnp.float32, jnp.bfloat16))


def quantize_pytree(params: Any) -> Tuple[Any, Any]:
    """(q_tree, scale_tree): int8 leaves + per-output-channel scales.

    Non-quantizable leaves pass through unchanged with a scalar 1.0 scale
    so both trees keep the params structure (jit-friendly). Site selection
    is the SAME `_is_conv_kernel` predicate as the full-int8 and QAT
    transforms: only conv kernels quantize — stacked biases/PReLU alphas
    ([G, B, C] leaves that would clear a naive size gate) must stay f32
    (one shared scale across G*B blocks can zero out a small block's
    bias), and channel-attention (`ca`/`fc*`) matrices stay float because
    they gate whole blocks through a sigmoid — accuracy risk for ~1KB.
    Scales are per output channel with keepdims on the leading stack axes
    (one scale per (G, B, O) slice, like `quantize_conv_kernels`): a
    single scale shared across all stacked blocks would squeeze a
    low-magnitude group onto a handful of int8 levels."""
    def qs(path, leaf):
        leaf = jnp.asarray(leaf)
        if not _is_conv_kernel(path, leaf):
            return leaf, jnp.asarray(1.0, jnp.float32)
        f = leaf.astype(jnp.float32)
        axes = tuple(range(leaf.ndim - 4, leaf.ndim - 1))  # kh, kw, I
        scale = jnp.max(jnp.abs(f), axis=axes, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)
        return q, scale

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    pairs = [qs(p, l) for p, l in flat]
    return (treedef.unflatten([q for q, _ in pairs]),
            treedef.unflatten([s for _, s in pairs]))


def quantize_conv_kernels(params: Any, with_sids: bool = False):
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
    slices q and scale together.

    With `with_sids=True`, each quant dict also carries an int32 "sid"
    array (one unique id per conv *site*, i.e. per slice of the leading
    stack axes) for the calibration pass, and the function returns
    `(tree, n_sites)`. See `calibrate_act_scales`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    n_sites = 0
    for path, leaf in flat:
        leaf = jnp.asarray(leaf)
        if not _is_conv_kernel(path, leaf):
            out.append(leaf)
            continue
        f = leaf.astype(jnp.float32)
        axes = tuple(range(leaf.ndim - 4, leaf.ndim - 1))  # kh, kw, I
        scale = jnp.max(jnp.abs(f), axis=axes, keepdims=True) / 127.0
        scale = jnp.where(scale == 0, 1.0, scale)
        q = {
            "q": jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8),
            "scale": scale,
        }
        if with_sids:
            stack_shape = leaf.shape[:leaf.ndim - 4]
            cnt = int(np.prod(stack_shape, dtype=np.int64)) if stack_shape else 1
            q["sid"] = jnp.asarray(
                np.arange(n_sites, n_sites + cnt, dtype=np.int32).reshape(stack_shape)
            )
            n_sites += cnt
        out.append(q)
    tree = treedef.unflatten(out)
    return (tree, n_sites) if with_sids else tree


def fake_quant_params(params: Any, act_scales: Any = None) -> Any:
    """QAT transform: wrap each conv-kernel leaf as a `{"fq": leaf}` dict
    that `facesr.ops.conv2d` dispatches to the differentiable fake-quant
    path (straight-through-estimator rounding on the EXACT int8 serving
    grid: per-output-channel weight scales + per-image activation scales —
    see `facesr.ops.conv._conv2d_fakequant`).

    Site selection is shared with `quantize_conv_kernels`, so training
    simulates precisely the kernels serving will quantize. The transform is
    a pure pytree re-wrap — differentiable, jit-safe, and applied INSIDE the
    loss on the latent float params, so the optimizer state, checkpoints and
    converters all keep the plain float tree. Apply via
    `TrainerConfig(qat=True)` or wrap any model_apply directly.

    `act_scales`: a calibrated int8 tree for the SAME architecture (from
    `calibrate_act_scales` / the `scripts/export_quantized.py` artifact via
    `facesr.parallel.serving.load_calibrated_qparams`). Its static "a"
    leaves ride along as `{"fq": w, "a": a}` so training fake-quantizes on
    the CALIBRATED serving grid — including its saturation behavior
    (activations beyond the calibrated range clip at +-127, exactly like
    the deployed int8_full path) — instead of the dynamic per-image grid.

    No reference equivalent (the reference never quantizes —
    /root/reference/src has no QAT); this closes the loop on the int8
    serving path so exported models keep their quality.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    if act_scales is None:
        out = [
            {"fq": jnp.asarray(leaf)} if _is_conv_kernel(path, jnp.asarray(leaf))
            else leaf
            for path, leaf in flat
        ]
        return treedef.unflatten(out)

    q_flat = jax.tree_util.tree_flatten_with_path(
        act_scales, is_leaf=lambda n: isinstance(n, dict) and "a" in n
    )[0]
    if len(q_flat) != len(flat):
        raise ValueError(
            f"act_scales tree does not match params: {len(q_flat)} vs "
            f"{len(flat)} leaves — calibrate on the same architecture")
    out = []
    for (path, leaf), (q_path, q_leaf) in zip(flat, q_flat):
        leaf = jnp.asarray(leaf)
        if not _is_conv_kernel(path, leaf):
            out.append(leaf)
            continue
        if not (isinstance(q_leaf, dict) and "a" in q_leaf):
            raise ValueError(
                f"act_scales has no calibrated scale at {jax.tree_util.keystr(path)}")
        if tuple(q_leaf["q"].shape) != tuple(leaf.shape):
            # count-matching trees from a different-width model would
            # otherwise broadcast silently (the 'a' leaves are [...,1,1,1,1])
            raise ValueError(
                f"act_scales was calibrated on a different architecture: "
                f"kernel {tuple(q_leaf['q'].shape)} vs params "
                f"{tuple(leaf.shape)} at {jax.tree_util.keystr(path)}")
        out.append({"fq": leaf, "a": jnp.asarray(q_leaf["a"])})
    return treedef.unflatten(out)


# ---------------------------------------------------------------------------
# Activation-scale calibration (static scales for the full-int8 path)
# ---------------------------------------------------------------------------
#
# The dynamic scheme computes max|x| before EVERY conv — a full HBM sweep
# plus a sequential dependency that keeps XLA from fusing the quantize into
# the previous conv's epilogue (measured ~half the non-conv time of the
# int8_full step, BENCH.md). Calibration replaces it: run representative
# images through the dynamic path once, record each conv site's observed
# max via an io_callback keyed by "sid" (callbacks work under lax.scan, and
# the sid disambiguates scan steps without relying on execution order),
# then attach the collected scales as a static "a" leaf that rides the
# params pytree exactly like q/scale do.

import threading as _threading

_ACT_STATS: dict = {"arr": None, "lock": _threading.Lock()}


def _record_act_max(sid, amax) -> None:
    i = int(np.asarray(sid).reshape(()))
    v = float(np.asarray(amax).reshape(()))
    # lock: ordered=False callbacks may run concurrently (multi-device or
    # threaded dispatch) and a lost read-modify-write would silently
    # undersize a scale. np.maximum (not Python max) so a NaN activation
    # sticks instead of being discarded — calibrate_act_scales then raises.
    with _ACT_STATS["lock"]:
        arr = _ACT_STATS["arr"]
        if arr is None:  # stale callback after the context closed — ignore
            return
        arr[i] = np.maximum(arr[i], v)


def maybe_record_act_scale(w: dict, a: jax.Array) -> None:
    """Called by the int8 conv at trace time: inserts a stats callback when
    a calibration context is open and the kernel dict carries a sid."""
    if _ACT_STATS["arr"] is None or "sid" not in w:
        return
    from jax.experimental import io_callback

    io_callback(_record_act_max, None, w["sid"], jnp.max(a), ordered=False)


@contextlib.contextmanager
def collecting_act_stats(n_sites: int):
    """Open a calibration window: int8 convs with sids record their dynamic
    per-image scale maxima into the yielded float64 array (max over all
    forwards run inside the window)."""
    if _ACT_STATS["arr"] is not None:
        raise RuntimeError("nested activation-stats collection")
    arr = np.zeros(n_sites, np.float64)
    _ACT_STATS["arr"] = arr
    try:
        yield arr
    finally:
        _ACT_STATS["arr"] = None


def attach_act_scales(qtree: Any, stats: np.ndarray, margin: float = 1.0) -> Any:
    """Turn calibration stats into static "a" leaves (shape = stack axes +
    [1,1,1,1] so scan slices them alongside q) and drop the sids. Sites the
    calibration never exercised (stat 0) fall back to scale 1.0."""
    def fix(node):
        if not (isinstance(node, dict) and "sid" in node):
            return node
        sid = np.asarray(node["sid"])
        a = stats[sid].astype(np.float32) * margin
        a = np.where(a <= 0, 1.0, a).reshape(sid.shape + (1, 1, 1, 1))
        out = {k: v for k, v in node.items() if k != "sid"}
        out["a"] = jnp.asarray(a)
        return out

    return jax.tree.map(
        fix, qtree,
        is_leaf=lambda n: isinstance(n, dict) and "sid" in n,
    )


def calibrate_act_scales(params: Any, forward_fn, batches, margin: float = 1.0) -> Any:
    """One-call calibration: quantize `params`' conv kernels, run
    `forward_fn(qparams, batch)` over the calibration `batches` (an iterable
    of image arrays) with dynamic quantization + stats recording, and return
    the quantized tree with static activation scales attached.

    `forward_fn` must route convs through `facesr.ops.conv2d` (all facesr
    models do). It may be jitted — pass a FRESH jit: the recording callbacks
    are baked into the trace, so a cached trace from before the window
    opened would record nothing."""
    qp, n_sites = quantize_conv_kernels(params, with_sids=True)
    with collecting_act_stats(n_sites) as stats:
        for batch in batches:
            jax.block_until_ready(forward_fn(qp, jnp.asarray(batch)))
        # block_until_ready waits on output buffers, NOT host-callback side
        # effects: without this barrier, in-flight ordered=False callbacks
        # from the last batch could land after the window closes and be
        # dropped by the stale-callback guard — silently undersized scales.
        jax.effects_barrier()
    # every conv site executes on every forward in these models, so a
    # per-site zero stat is always anomalous (dropped callbacks, all-zero
    # calibration input) and a NaN means non-finite activations — either
    # would silently become a degenerate static scale of 1.0 on the
    # deployed grid. (~(stats > 0) also catches NaN.)
    bad = np.flatnonzero(~(stats > 0) | ~np.isfinite(stats))
    if bad.size:
        raise RuntimeError(
            f"calibration left {bad.size}/{stats.size} conv sites without a "
            f"positive finite activation max (sids {bad[:8].tolist()}"
            f"{'...' if bad.size > 8 else ''}) — did the forward route "
            "through facesr.ops.conv2d with the quantized tree, and was the "
            "calibration input non-degenerate?"
        )
    return attach_act_scales(qp, stats, margin=margin)


def dequantize_pytree(q_tree: Any, scale_tree: Any, dtype=jnp.bfloat16) -> Any:
    """Rebuild a params pytree in `dtype`; int8 leaves scale back, float
    leaves pass through (their dtype is handled by the model's policy)."""
    def deq(q, s):
        if q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        return q

    return jax.tree.map(deq, q_tree, scale_tree)


def quantization_summary(q_tree: Any) -> dict:
    """Footprint summary for a quantized tree (weight-only q_tree or a
    quantize_conv_kernels tree). Sidecar leaves — per-channel scales,
    calibrated "a" arrays, int32 sids — count toward `bytes` (they ship
    with the model) but NOT toward the `bytes_f32` baseline, which is the
    original float tree's size."""
    leaves = jax.tree_util.tree_leaves_with_path(q_tree)

    def is_sidecar(path):
        last = str(getattr(path[-1], "key", getattr(path[-1], "idx", "")))
        return last in ("scale", "a", "sid")

    q_bytes = f_bytes = orig = 0
    n_q = 0
    for path, l in leaves:
        side = is_sidecar(path)
        if l.dtype == jnp.int8:
            q_bytes += l.size
            n_q += 1
            orig += l.size * 4
        else:
            f_bytes += l.size * l.dtype.itemsize
            if not side:
                orig += l.size * 4
    return {
        "quantized_leaves": n_q,
        "total_leaves": len(leaves),
        "bytes": q_bytes + f_bytes,
        "bytes_f32": orig,
        "compression": orig / max(q_bytes + f_bytes, 1),
    }
