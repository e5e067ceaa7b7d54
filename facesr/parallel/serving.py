"""Sharded inference serving: batch-parallel SR across a device mesh.

The v5e-8 serving path for the BASELINE.json north star (images/sec on an
8-chip pod): batches are sharded over the `data` axis, params replicated,
and each chip runs the jitted forward — throughput scales linearly in
chips since there is no cross-image communication in the model. Partial
batches are padded to a mesh multiple and trimmed after.
"""

from __future__ import annotations

import os
import threading
import time
from collections import OrderedDict
from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from facesr.parallel.mesh import (
    get_mesh, replicate, batch_sharding, row_sharding, pad_to_multiple,
)

__all__ = ["ShardedPredictor", "SpatialPredictor", "MicroBatcher",
           "build_serving_fn",
           "calibrated_qparams", "load_calibrated_qparams",
           "load_calibration_images", "per_model_quant_cache"]


def per_model_quant_cache(quant_cache, model_name: str):
    """The per-model quant-cache filename contract, shared by the API and
    the demo (a drifting copy in either would silently split their caches):
    `<base>.<model_name_slug>.fckpt`, or None when no base path is set."""
    if not quant_cache:
        return None
    return f"{quant_cache}.{model_name.lower().replace(' ', '_')}.fckpt"


def load_calibration_images(calib_dir: str, size: int = 64, limit: int = 64):
    """Load up to `limit` images as an [N, size, size, 3] float batch in
    [0,1] (resized INTER_AREA — the scales are per-site scalars, so the
    calibration shape need not match the serving shape). Shared by the
    HTTP API, the demo, and the compare CLI for the int8_full path."""
    import cv2

    from facesr.data.dataset import _list_images

    # the shared case-insensitive lister (camera exports are *.JPG) —
    # per-extension lowercase globs silently calibrate on a subset
    from pathlib import Path

    # truncate to `limit` AFTER the readability filter, not before —
    # unreadable files at the front of the listing must not crowd out
    # good images further down
    imgs = []
    for p in (str(p) for p in _list_images(Path(calib_dir))):
        if len(imgs) >= limit:
            break
        bgr = cv2.imread(p, cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        if rgb.shape[:2] != (size, size):
            rgb = cv2.resize(rgb, (size, size), interpolation=cv2.INTER_AREA)
        imgs.append(rgb.astype(np.float32) / 255.0)
    if not imgs:
        raise RuntimeError(f"No readable calibration images in {calib_dir}")
    return np.stack(imgs)


def _params_fingerprint(params) -> str:
    """Content hash of a params pytree (leaf bytes in tree order) — pins a
    quant cache to the exact weights it was calibrated from."""
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(params):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()


def load_calibrated_qparams(params, cache_path: str,
                            require_weight_match: bool = True):
    """Restore a calibrated int8 tree (scripts/export_quantized.py artifact
    / ShardedPredictor quant_cache) against this model's params structure.
    Fails loudly on architecture mismatch AND — for serving — on a weights
    mismatch: the cache stores the source params' content hash, so a
    retrained checkpoint cannot silently serve the OLD model's int8 kernels
    (shape checks alone pass for any same-architecture weights).

    `require_weight_match=False` downgrades the weights-hash mismatch to a
    provenance warning. This is the QAT grid-pinning contract (train.py
    --qat-scales): training deliberately moves weights AWAY from the
    calibration source, so a later-epoch re-run or a resumed fine-tune
    legitimately pins to an artifact calibrated from earlier weights — only
    the *serving* consumers (int8_full predictors, the API/demo/export)
    need the strict hash."""
    from facesr.ckpt.checkpoint import load_checkpoint
    from facesr.ops.quant import attach_act_scales, quantize_conv_kernels

    qp_sid, n_sites = quantize_conv_kernels(params, with_sids=True)
    target = attach_act_scales(qp_sid, np.ones(n_sites))
    tree, meta = load_checkpoint(cache_path, target=target)
    if meta.get("kind") != "facesr-int8-calibrated":
        raise ValueError(f"{cache_path} is not a calibrated-int8 cache")
    cached_fp = meta.get("params_sha256")
    if cached_fp is None:
        print(f"Warning: quant cache {cache_path} predates weight "
              f"fingerprinting — cannot verify it matches this model's "
              f"weights; re-export to silence this")
    elif cached_fp != _params_fingerprint(params):
        if require_weight_match:
            raise ValueError(
                f"quant cache {cache_path} was calibrated from DIFFERENT "
                f"weights than this model's (content hash mismatch) — "
                f"serving it would silently use the old model; re-run "
                f"calibration / scripts/export_quantized.py for the "
                f"current checkpoint")
        print(f"Note: {cache_path} was calibrated from different weights "
              f"than the current model's (expected when pinning a QAT grid "
              f"from an earlier checkpoint; the static scales remain the "
              f"deployed serving grid)")

    def check(got, want):
        if np.shape(got) != np.shape(want):
            raise ValueError(
                f"quant cache {cache_path} does not match this model: "
                f"leaf shape {np.shape(got)} vs expected {np.shape(want)}")
        return got

    return jax.tree.map(check, tree, target)


def calibrated_qparams(params, apply_fn, calibration: np.ndarray, max_batch: int,
                       cache_path: Optional[str] = None):
    """Quantize conv kernels and calibrate static activation scales by
    running `calibration` images through `apply_fn` (see
    facesr.ops.quant.calibrate_act_scales).

    The stats collection uses io_callback, which some PJRT plugins (the
    axon dev tunnel) don't support — those fall back to running the
    calibration forward on the host CPU backend (one-time cost; the
    collected scales are platform-independent).

    `cache_path`: persist/reuse the calibrated tree (msgpack via
    facesr.ckpt). Calibration is a one-time offline cost (minutes on
    callback-less platforms where it runs on the host CPU) that serving
    startup should not repeat; a cached tree from a different
    architecture fails structure restoration loudly."""
    from facesr.ops.quant import calibrate_act_scales

    if cache_path and os.path.exists(cache_path):
        return load_calibrated_qparams(params, cache_path)

    if calibration is None or len(np.atleast_1d(calibration)) == 0:
        raise ValueError(
            "calibrated_qparams needs calibration images (none given"
            + (f" and cache {cache_path!r} does not exist" if cache_path
               else "") + ") — pass a [N,H,W,3] float batch; small images "
            "are fine, the scales are per-site scalars")

    calib = np.asarray(calibration, np.float32)
    n = min(max_batch, len(calib))
    chunks = []
    for i in range(0, len(calib), n):
        c, _ = pad_to_multiple(calib[i:i + n], n)
        chunks.append(c)

    # Fresh jit per call: the stats callbacks are baked into the trace, so
    # a trace cached from outside a collection window would record nothing.
    def fwd(p, x):
        return apply_fn(p, x, train=False, dtype=jnp.bfloat16)

    if _callbacks_supported():
        qp = calibrate_act_scales(params, jax.jit(fwd), chunks)
    else:
        cpu = jax.devices("cpu")[0]
        params_cpu = jax.device_put(params, cpu)
        with jax.default_device(cpu):
            qp = calibrate_act_scales(params_cpu, jax.jit(fwd), chunks)
    if cache_path:
        from flax import serialization
        from facesr.ckpt.checkpoint import save_checkpoint

        # to_state_dict first: python lists (upsample stages) become
        # indexed dicts, the format from_state_dict restores into targets
        save_checkpoint(cache_path, serialization.to_state_dict(qp),
                        {"kind": "facesr-int8-calibrated",
                         # pin to the source weights (see
                         # load_calibrated_qparams): same-architecture
                         # retrains must not silently serve this cache
                         "params_sha256": _params_fingerprint(params)})
    return qp


def build_serving_fn(apply_fn, params, dtype=None,
                     calibration: Optional[np.ndarray] = None,
                     quant_cache: Optional[str] = None, max_batch: int = 8,
                     require_calibration: bool = False):
    """THE serving dtype dispatch — single source for every serving
    surface (SpatialPredictor, ShardedPredictor, AOT export). Returns
    `(forward, served_params)` where `forward(served_params, x)` is the
    eval-mode clipped SR forward under the given precision:

      - None / jnp dtype: plain forward in that compute dtype.
      - "int8": weight-only quantization (kernels stored s8 + scales,
        dequantized to bf16 on the fly — 4x smaller params, bf16 speed).
      - "int8_full": weights AND activations on the MXU s8 pipe; with
        `calibration` images (or a `quant_cache` artifact) the activation
        scales are static/calibrated — the production path (BENCH.md).

    `require_calibration`: when a `quant_cache` path is named but missing
    and no calibration images are given, True raises (offline export must
    not silently change precision semantics); False falls back to dynamic
    activation scales (a serving process should come up).
    """
    if dtype != "int8_full" and (calibration is not None or quant_cache):
        # don't silently drop an explicitly requested calibration artifact
        # — only the int8_full path has activation scales to calibrate
        print(f"Warning: calibration/quant_cache only apply to "
              f"dtype='int8_full' (got dtype={dtype!r}); ignoring them")
    if dtype == "int8":
        from facesr.ops.quant import quantize_pytree, dequantize_pytree

        q_tree, s_tree = quantize_pytree(params)
        served = {"q": q_tree, "s": s_tree}

        def forward(p, x):
            deq = dequantize_pytree(p["q"], p["s"], jnp.bfloat16)
            return jnp.clip(apply_fn(deq, x, train=False, dtype=jnp.bfloat16),
                            0.0, 1.0)
    elif dtype == "int8_full":
        from facesr.ops.quant import quantize_conv_kernels

        if (calibration is not None
                or (quant_cache and os.path.exists(quant_cache))
                or (quant_cache and require_calibration)):
            # the last arm lets calibrated_qparams raise its loud
            # missing-calibration error instead of silently going dynamic
            served = calibrated_qparams(params, apply_fn, calibration,
                                        max_batch, cache_path=quant_cache)
        else:
            served = quantize_conv_kernels(params)

        def forward(p, x):
            return jnp.clip(apply_fn(p, x, train=False, dtype=jnp.bfloat16),
                            0.0, 1.0)
    else:
        served = params

        def forward(p, x):
            return jnp.clip(apply_fn(p, x, train=False, dtype=dtype),
                            0.0, 1.0)
    return forward, served


class SpatialPredictor:
    """Spatial-parallel SR: shard the IMAGE ROWS across the mesh instead of
    the batch — the model-parallel axis for latency-bound batch-1 serving
    and for inputs too large for one chip's HBM, where batch parallelism
    has nothing to shard (the reference is single-GPU and simply cannot
    serve such inputs — SURVEY.md §5).

    TPU-native mechanics: the input carries a NamedSharding of P(None,
    "data") on H and the forward is jitted over the mesh — XLA's SPMD
    partitioner derives everything else from that annotation: halo
    exchanges for the 3x3 convs at shard boundaries, all-reduces for the
    SE global pools, and (all-)gathers for the bicubic-skip row
    contraction, all riding ICI. No hand-written ppermute — the "annotate
    shardings, let XLA insert collectives" recipe. Numerically equivalent
    to the single-device forward (tests/test_parallel.py gates it).

    Compiles per input shape (large-image serving is shape-diverse; no
    padding/chunking games like ShardedPredictor's batch path). When H is
    not divisible by the mesh size, the call runs on the largest device
    count that divides H — exactness is never traded for parallelism
    (padding rows would perturb the conv outputs inside the receptive
    field of the seam).

    Args mirror ShardedPredictor; dtype supports the same serving
    precisions. Note int8_full's *dynamic* activation scales would insert
    an all-reduce-max before every conv under row sharding — pass
    `calibration` images so the scales are static (recommended for the
    quantized spatial path).
    """

    def __init__(self, model, mesh=None, dtype=jnp.bfloat16,
                 calibration: Optional[np.ndarray] = None,
                 quant_cache: Optional[str] = None):
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        # max_batch=1 calibration forwards: this class exists for inputs
        # too large to batch on one chip — don't require the calibration
        # pass to. Pass SMALL calibration images (the scales are per-site
        # scalars, resolution-free).
        self._forward, self._host_params = build_serving_fn(
            model.apply_fn, model.params, dtype=dtype,
            calibration=calibration, quant_cache=quant_cache, max_batch=1)
        self._by_n: dict = {}  # n_devices_used -> (jitted fwd, sub-mesh, sharding)
        # Device-resident params per n, LRU-bounded: device 0 belongs to
        # every sub-mesh prefix, so caching a replication per distinct n
        # would stack up to n_devices params copies in its HBM on
        # shape-diverse workloads. Compiled programs stay cached (compiles
        # are expensive); re-replicating params on an evicted n is one
        # small host->device transfer.
        self._params_by_n: "OrderedDict[int, object]" = OrderedDict()
        self._params_cache_size = 2
        self._warned_h: set = set()  # H values already warned about

    def _plan(self, h: int):
        n = self.n_devices
        while h % n:
            n -= 1
        if (n < self.n_devices and h not in self._warned_h
                and len(self._warned_h) < 256):
            # loud, else a prime H silently serves single-chip (VERDICT r2)
            self._warned_h.add(h)
            print(f"SpatialPredictor: H={h} not divisible by the "
                  f"{self.n_devices}-device mesh — serving this shape on "
                  f"{n} device(s). Pad/resize inputs to a multiple of "
                  f"{self.n_devices} rows to use the whole mesh.")
        if n not in self._by_n:
            from facesr.parallel.mesh import replicated

            sub = get_mesh(self.mesh.devices.flatten()[:n])
            sh = row_sharding(sub)
            fwd = jax.jit(self._forward,
                          in_shardings=(replicated(sub), sh),
                          out_shardings=sh)
            self._by_n[n] = (fwd, sub, sh)
        fwd, sub, sh = self._by_n[n]
        if n in self._params_by_n:
            self._params_by_n.move_to_end(n)
        else:
            self._params_by_n[n] = replicate(self._host_params, sub)
            while len(self._params_by_n) > self._params_cache_size:
                self._params_by_n.popitem(last=False)
        return fwd, self._params_by_n[n], sh

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """NHWC float batch (usually N=1) -> SR batch, rows sharded over
        the mesh (or the largest H-dividing subset of it)."""
        images = np.asarray(images, np.float32)
        fwd, params, sh = self._plan(images.shape[1])
        x = jax.device_put(images, sh)
        return np.asarray(fwd(params, x))


_CALLBACKS_SUPPORTED: Optional[bool] = None


def _callbacks_supported() -> bool:
    """Probe io_callback support on the default backend with a trivial
    program (the axon dev tunnel rejects host callbacks at RUN time, after
    the full model would already have compiled — so probe cheaply first)."""
    global _CALLBACKS_SUPPORTED
    if _CALLBACKS_SUPPORTED is None:
        from jax.experimental import io_callback

        try:
            jax.block_until_ready(jax.jit(
                lambda x: io_callback(lambda v: np.asarray(v), jax.ShapeDtypeStruct((), np.float32), x)
            )(jnp.asarray(0.0, jnp.float32)))
            _CALLBACKS_SUPPORTED = True
        except Exception:
            _CALLBACKS_SUPPORTED = False
    return _CALLBACKS_SUPPORTED


class ShardedPredictor:
    """Wraps a model wrapper (.apply_fn/.params/.config) for sharded serving.

    Args:
        model: FaceEnhanceNet / RRDBNet / TransferSRModel wrapper.
        mesh: optional Mesh (defaults to all devices on a `data` axis).
        dtype: compute dtype (bf16 default on TPU; None = f32 parity path;
            "int8" serves per-channel int8 weights with bf16 activations —
            4x smaller weights, throughput parity; "int8_full" also
            quantizes activations per image so convs run on the MXU's
            native s8 pipe — fastest, with a larger quality delta
            documented in BENCH.md).
        max_batch: compiled batch size; larger inputs are chunked, smaller
            padded (one compiled program total).
        calibration: optional NHWC float array of representative LR images
            (int8_full only). When given, a one-time calibration pass
            records each conv site's activation range and serving uses
            static scales — removes the per-conv abs-max reduction from the
            hot path (the dominant non-conv cost of int8_full, BENCH.md).
        quant_cache: optional path persisting the calibrated tree so
            serving restarts skip the calibration pass (see
            calibrated_qparams).
        remainder_sizes: opt-in smaller compiled batch sizes for the final
            chunk of a request (e.g. ``(32, 64, 96)`` with max_batch 128).
            Default () keeps the one-program-for-lifetime guarantee. When
            set, a request whose remainder fits a smaller size pads to that
            size instead of max_batch — worth up to ~8% throughput on
            remainder-bearing request sizes (BENCH.md "remainder-batch
            economics") at the cost of one extra XLA compile the FIRST time
            each (size, H, W) appears; unsuitable where first-request
            latency spikes matter. Sizes are rounded up to device multiples
            and capped below max_batch.
    """

    def __init__(self, model, mesh=None, dtype=jnp.bfloat16, max_batch: int = 128,
                 calibration: Optional[np.ndarray] = None,
                 quant_cache: Optional[str] = None,
                 remainder_sizes: Sequence[int] = ()):
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_devices = int(np.prod(self.mesh.devices.shape))
        self.max_batch = max(max_batch - max_batch % self.n_devices, self.n_devices)
        self.remainder_sizes = tuple(sorted(
            {s + (-s % self.n_devices) for s in remainder_sizes
             if 0 < s + (-s % self.n_devices) < self.max_batch}))
        from facesr.parallel.mesh import replicated

        # dtype="int8_full": weights AND activations on the MXU's s8 pipe
        # (2x the bf16 conv rate on v5e — BENCH.md); elementwise tail
        # stays bf16. Larger quality delta than weight-only "int8".
        forward, served = build_serving_fn(
            model.apply_fn, model.params, dtype=dtype,
            calibration=calibration, quant_cache=quant_cache,
            max_batch=self.max_batch)
        self.params = replicate(served, self.mesh)

        self._fwd = jax.jit(
            forward,
            in_shardings=(replicated(self.mesh), batch_sharding(self.mesh)),
        )

    def __call__(self, images: np.ndarray) -> np.ndarray:
        """NHWC float batch (any size) -> SR batch, chunked/padded to the
        compiled batch size (always max_batch, so the whole lifetime of the
        predictor uses ONE compiled program — padding only to a device
        multiple would recompile for every distinct remainder size).

        Chunks are software-pipelined (depth 2): dispatch is async under
        JAX, so chunk i+1's upload + forward overlap chunk i's
        device->host result transfer instead of serializing on it. Depth
        is capped (pipeline depth 3: a chunk drains once two newer ones are
        in flight) to bound live chunk outputs on device."""
        images = np.asarray(images, np.float32)
        if len(images) == 0:
            raise ValueError("ShardedPredictor called with 0 images — the "
                             "input directory/batch is empty")
        outs = []
        in_flight: list = []  # [(device result, valid_count)]
        for i in range(0, len(images), self.max_batch):
            valid = min(self.max_batch, len(images) - i)
            target = self.max_batch
            for s in self.remainder_sizes:  # sorted ascending; opt-in only
                if valid <= s:
                    target = s
                    break
            chunk, valid = pad_to_multiple(images[i:i + self.max_batch],
                                           target)
            x = jax.device_put(chunk, batch_sharding(self.mesh))
            in_flight.append((self._fwd(self.params, x), valid))
            if len(in_flight) > 2:
                y, v = in_flight.pop(0)
                outs.append(np.asarray(y[:v]))
        for y, v in in_flight:
            outs.append(np.asarray(y[:v]))
        return np.concatenate(outs, axis=0)


class MicroBatcher:
    """Coalesce concurrent single-image requests into one device batch.

    TPU serving is throughput-optimal at large batches (BENCH.md: batch 128
    runs ~1.8x the img/s of batch 32) while HTTP requests arrive one image
    at a time. A background dispatcher collects requests for up to
    `window_ms` (or until `max_batch` same-shape images are waiting), runs
    ONE batched forward, and hands each caller its slice — callers block
    only for their own result. Per-image outputs are identical to
    single-request serving because the model has no cross-image state and
    the int8 path uses per-IMAGE activation scales (batch-composition
    independence, facesr.ops.conv). No reference equivalent (the reference
    serves one image per gradio interaction, app/demo.py:225-359).

    `fn`: batched forward, [N,h,w,3] float32 -> [N,H,W,3]. Mixed input
    shapes are grouped: each dispatch takes the longest same-shape prefix
    cohort of the queue.
    """

    def __init__(self, fn: Callable, max_batch: int = 8, window_ms: float = 5.0):
        self.fn = fn
        self.max_batch = max(1, int(max_batch))
        self.window = max(0.0, float(window_ms)) / 1000.0
        self.calls = 0          # batched forwards issued
        self.images = 0         # images served (observability: images/calls
                                # = achieved batching factor)
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._pending: list = []
        self._closed = False
        self._worker = threading.Thread(
            target=self._loop, daemon=True, name="facesr-microbatcher")
        self._worker.start()

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """Submit one HWC image; blocks until its SR result is ready."""
        item = {"x": np.asarray(image), "out": None, "err": None,
                "done": threading.Event()}
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._pending.append(item)
            self._cv.notify()
        item["done"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["out"]

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=5)

    # ------------------------------------------------------------------
    def _take_cohort(self) -> list:
        """Pop up to max_batch queued items sharing the first item's shape
        (a single dispatch needs one static shape; stragglers with other
        shapes stay queued for the next dispatch)."""
        shape = self._pending[0]["x"].shape
        cohort, rest = [], []
        for item in self._pending:
            if len(cohort) < self.max_batch and item["x"].shape == shape:
                cohort.append(item)
            else:
                rest.append(item)
        self._pending = rest
        return cohort

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._pending and not self._closed:
                    self._cv.wait()
                if self._closed and not self._pending:
                    return
                # linger up to the window for co-arriving requests; count
                # only items matching the head item's shape — other shapes
                # dispatch as their own cohorts and must not end this
                # window early
                deadline = time.monotonic() + self.window
                head_shape = self._pending[0]["x"].shape
                while not self._closed:
                    n_same = sum(1 for it in self._pending
                                 if it["x"].shape == head_shape)
                    if n_same >= self.max_batch:
                        break
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cv.wait(remaining)
                cohort = self._take_cohort()
            try:
                batch = np.stack([i["x"] for i in cohort])
                out = np.asarray(self.fn(batch))
                with self._lock:  # /health reads calls/images as a pair
                    self.calls += 1
                    self.images += len(cohort)
                for idx, item in enumerate(cohort):
                    item["out"] = out[idx]
            except Exception as batch_err:
                # One poisoned request must not fail innocent co-batched
                # callers: retry each image alone so only the offender(s)
                # see an error. A 1-image cohort already WAS the per-image
                # attempt — error it without a pointless identical retry.
                for item in cohort:
                    if len(cohort) == 1:
                        item["err"] = batch_err
                        continue
                    try:
                        out = np.asarray(self.fn(item["x"][None]))
                        with self._lock:
                            self.calls += 1
                            self.images += 1
                        item["out"] = out[0]
                    except Exception as e:
                        item["err"] = e
            finally:
                for item in cohort:
                    item["done"].set()
