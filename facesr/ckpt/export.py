"""Ahead-of-time serving export via `jax.export` (StableHLO).

Packages the exact serving forward — weights baked in as constants, any
of the ShardedPredictor dtype modes (bf16 / f32 / weight-only int8 /
int8_full with optional calibrated static scales) — into one serialized
artifact that deploys without Python model code, checkpoints, or facesr
itself: `jax.export.deserialize(blob).call(x)` is the entire runtime
surface. The batch dimension is exported symbolically by default, so one
artifact serves every batch size without retracing.

The reference has no export path at all (serving always re-instantiates
the torch module and loads the .pth at startup — app/demo.py:55-112);
this is the TPU-native deployment story: XLA compiles the deserialized
StableHLO on the target (tpu and cpu by default), and the int8 variants
embed s8 kernels, so the artifact is ~4x smaller than the checkpoint.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


def build_serving_fn(model, dtype=None, calibration: Optional[np.ndarray] = None,
                     quant_cache: Optional[str] = None, max_batch: int = 8):
    """(fn, params): the single-device serving forward for a model wrapper —
    a thin delegation to facesr.parallel.serving.build_serving_fn, THE
    single source of the serving dtype dispatch, so the exported artifact
    can never desynchronize from live ShardedPredictor/SpatialPredictor
    serving. `params` are returned separately so callers can bake them
    (export) or keep them as arguments (tests). Unlike the live
    predictors, a named-but-missing quant_cache with no calibration images
    raises here (offline export must not silently change precision
    semantics)."""
    from facesr.parallel.serving import build_serving_fn as _shared

    return _shared(model.apply_fn, model.params, dtype=dtype,
                   calibration=calibration, quant_cache=quant_cache,
                   max_batch=max_batch, require_calibration=True)


def export_serving(model, dtype=None, batch: Optional[int] = None,
                   input_size: int = 64,
                   platforms: Sequence[str] = ("tpu", "cpu"),
                   calibration: Optional[np.ndarray] = None,
                   quant_cache: Optional[str] = None) -> bytes:
    """Serialize the serving forward to a StableHLO artifact (bytes).

    batch=None exports a SYMBOLIC batch dimension — one artifact, any
    batch size, no retrace (jax.export shape polymorphism); an int pins
    it. `platforms` lists every backend the artifact must run on; the
    default covers the TPU serving fleet and CPU verification hosts.
    """
    fn, params = build_serving_fn(model, dtype=dtype, calibration=calibration,
                                  quant_cache=quant_cache,
                                  max_batch=batch or 8)
    return export_built(fn, params, batch=batch, input_size=input_size,
                        platforms=platforms)


def export_built(fn, params, batch: Optional[int] = None,
                 input_size: int = 64,
                 platforms: Sequence[str] = ("tpu", "cpu")) -> bytes:
    """Export an already-built `(params, x) -> sr` serving fn (see
    build_serving_fn) with `params` baked in as constants."""
    params = jax.tree.map(jnp.asarray, params)  # bake as closure constants
    baked = jax.jit(lambda x: fn(params, x))

    if batch is None:
        (scope,) = jax_export.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((scope, input_size, input_size, 3),
                                      jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch, input_size, input_size, 3),
                                      jnp.float32)
    exported = jax_export.export(baked, platforms=list(platforms))(x_spec)
    return exported.serialize()


def load_exported(path_or_bytes):
    """Deserialize an exported artifact into a callable `f(x) -> sr`.

    Accepts a file path or raw bytes. The callable jit-compiles on first
    use per shape (symbolic-batch artifacts compile once per distinct
    batch size, like any jit)."""
    blob = path_or_bytes
    if not isinstance(blob, (bytes, bytearray)):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(bytes(blob))
    # ONE stable jit wrapper: a fresh jax.jit(exported.call) per invocation
    # would retrace + recompile on every call (measured ~25x slower even on
    # a toy export).
    jitted = jax.jit(exported.call)

    def call(x):
        return np.asarray(jitted(jnp.asarray(x, jnp.float32)))

    call.exported = exported
    return call


def load_exported_many(spec: str, spatial: Optional[int] = None,
                       require_symbolic_batch: bool = False) -> dict:
    """Load a comma-separated list of artifact paths, keyed by filename
    stem — the shared parser behind `api --exported`, `demo --exported`.

    Loud at LOAD time instead of per-request tracebacks:
      - `spatial`: the LR size the server will feed; a mismatched artifact
        (exported with a different --input-size) is rejected here.
      - `require_symbolic_batch`: servers that batch variably (request
        micro-batching) reject artifacts with a pinned batch dim.
      - duplicate stems (same-named artifacts from different directories)
        are rejected rather than silently shadowing each other.
    """
    from pathlib import Path

    out = {}
    for path in [p.strip() for p in spec.split(",") if p.strip()]:
        fn = load_exported(path)
        ex = getattr(fn, "exported", None)
        if ex is not None and ex.in_avals:
            shape = ex.in_avals[0].shape
            b, h, w = shape[0], shape[1], shape[2]
            if spatial is not None and isinstance(h, int) and \
                    (h, w) != (spatial, spatial):
                raise ValueError(
                    f"{path}: artifact expects {h}x{w} inputs but this "
                    f"server feeds {spatial}x{spatial} LR images — "
                    f"re-export with --input-size {spatial}")
            if isinstance(b, int) and (require_symbolic_batch or b != 1):
                raise ValueError(
                    f"{path}: artifact batch dimension is pinned to {b} "
                    f"but this server feeds variable batches — re-export "
                    f"without --batch (symbolic batch)")
        stem = Path(path).stem
        if stem in out:
            raise ValueError(
                f"duplicate artifact name {stem!r} ({path}) — artifacts "
                f"are keyed by filename stem; rename one")
        out[stem] = fn
    return out
