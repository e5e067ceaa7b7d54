#!/usr/bin/env python
"""Export a checkpoint's serving forward to a deployable StableHLO artifact.

One file, weights baked in, batch-polymorphic by default — deployment
needs only `jax.export.deserialize(blob).call(x)`, no facesr / model code
/ checkpoint (see facesr/ckpt/export.py; the reference has no export path
— its serving always reconstructs the torch module at startup,
app/demo.py:55-112).

    python scripts/export_serving.py --checkpoint ckpt/best_model.fckpt \
        --output serve/model.jaxexp --dtype int8_full --calib-dir data/val/LR
    # pinned batch instead of symbolic:  --batch 128
    # verify on this host's backend:      --verify
"""

import argparse
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Export serving forward via jax.export")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--dtype", default="bf16",
                   choices=["bf16", "f32", "int8", "int8_full"],
                   help="serving mode (same semantics as the HTTP API)")
    p.add_argument("--batch", type=int, default=None,
                   help="pin the batch dimension (default: symbolic — one "
                        "artifact serves every batch size)")
    p.add_argument("--input-size", type=int, default=64)
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated target platforms")
    p.add_argument("--calib-dir", default=None,
                   help="with --dtype int8_full: calibrate static activation "
                        "scales on the LR images in this directory")
    p.add_argument("--quant-cache", default=None,
                   help="calibrated-scale artifact to reuse (export_quantized)")
    p.add_argument("--verify", action="store_true",
                   help="deserialize and compare against the live forward")
    p.add_argument("--platform", default=None, help="JAX platform (e.g. cpu)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from facesr.models.load import load_any_model
    from facesr.ckpt.export import export_built, load_exported, build_serving_fn

    model = load_any_model(args.checkpoint)
    calibration = None
    if args.calib_dir:
        from facesr.parallel.serving import load_calibration_images

        calibration = load_calibration_images(args.calib_dir)

    dtype = {"bf16": "bf16", "f32": None,
             "int8": "int8", "int8_full": "int8_full"}[args.dtype]
    if dtype == "bf16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16

    # built once: the verify step reuses the same fn/params (a second
    # build would re-run int8 calibration)
    fn, params = build_serving_fn(model, dtype=dtype, calibration=calibration,
                                  quant_cache=args.quant_cache,
                                  max_batch=args.batch or 8)
    blob = export_built(fn, params, batch=args.batch,
                        input_size=args.input_size,
                        platforms=[s.strip() for s in
                                   args.platforms.split(",") if s.strip()])
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(blob)
    shape = (args.batch or "b", args.input_size, args.input_size, 3)
    print(f"Exported {args.dtype} serving forward {shape} "
          f"for {args.platforms} -> {out} ({len(blob) / 1e6:.2f} MB)")

    if args.verify:
        serve = load_exported(bytes(blob))
        rng = np.random.default_rng(0)
        x = rng.random((args.batch or 2, args.input_size, args.input_size, 3),
                       dtype=np.float32)
        got = serve(x)
        import jax

        want = np.asarray(jax.jit(fn)(jax.tree.map(np.asarray, params), x))
        err = float(np.max(np.abs(got.astype(np.float32) - want.astype(np.float32))))
        # dtype-dependent tolerance: baking params as constants lets XLA
        # fold/fuse the bf16 weight casts differently, so bf16/int8 modes
        # legitimately drift a few bf16 ulps (~4e-3 each near 1.0 —
        # measured 8.6e-3 on a 2-block model); only the f32 path is
        # ~bit-exact. Real export breakage (wrong weights/layout) shows as
        # O(0.1+) error, far above this gate.
        tol = 1e-5 if dtype is None else 1e-2
        print(f"verify: max |exported - live| = {err:.2e} "
              f"on batch {x.shape[0]} (tol {tol:.0e}: "
              f"{'OK' if err < tol else 'MISMATCH'})")
        if err >= tol:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
