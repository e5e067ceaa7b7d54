"""On-chip inference throughput bench: bf16 vs int8 serving variants.

Times the pure on-device serving forward (production 6x10x64 model,
64x64 -> 256x256, the exact ShardedPredictor computation) with on-device
scalar sync — end-to-end predictor calls through the dev tunnel measure
the ~100MB/call output transfer, not the chip (BENCH.md), so the jitted
forward returns a scalar mean and the queue is gated by one float() fetch.

Variants:
  bf16          the headline serving path
  int8          weight-only quantization (footprint win, throughput parity)
  int8_full     weights + dynamic per-image activation scales (s8 MXU pipe)
  int8_cal      weights + CALIBRATED static activation scales — removes the
                per-conv abs-max reduction so XLA fuses the quantize into
                the producer epilogue (facesr.ops.quant.calibrate_act_scales)

Usage: python benchmarks/infer_bench.py [--batch 128] [--modes bf16,int8_cal]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--modes", default="bf16,int8_full,int8_cal")
    p.add_argument("--calib-images", type=int, default=16)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from facesr.models import face_enhance_net as fen
    from facesr.ops.quant import quantize_pytree, dequantize_pytree, quantize_conv_kernels
    from facesr.parallel.serving import calibrated_qparams

    cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10, num_channels=64)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1),
                          model.params["conv_last"]["w"].shape) * 0.02)
    apply_fn = model.apply_fn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, 64, 64, 3), dtype=np.float32))

    def serving_params(mode):
        if mode == "bf16":
            return model.params
        if mode == "int8":
            q, s = quantize_pytree(model.params)
            return {"q": q, "s": s}
        if mode == "int8_full":
            return quantize_conv_kernels(model.params)
        if mode == "int8_cal":
            calib = rng.random((args.calib_images, 64, 64, 3), dtype=np.float32)
            t0 = time.perf_counter()
            qp = calibrated_qparams(model.params, apply_fn, calib, args.batch)
            print(f"  calibration ({args.calib_images} imgs): "
                  f"{time.perf_counter() - t0:.1f}s")
            return jax.device_put(qp, jax.devices()[0])
        raise ValueError(mode)

    def forward(mode):
        if mode == "int8":
            def f(params, x):
                deq = dequantize_pytree(params["q"], params["s"], jnp.bfloat16)
                return jnp.clip(apply_fn(deq, x, train=False, dtype=jnp.bfloat16), 0, 1)
        else:
            def f(params, x):
                return jnp.clip(apply_fn(params, x, train=False, dtype=jnp.bfloat16), 0, 1)
        return f

    results, mean_out = {}, {}
    for mode in args.modes.split(","):
        params = serving_params(mode)
        fwd = forward(mode)
        # scalar return: sync gate without pulling the 100MB output off-chip
        g = jax.jit(lambda p, x: fwd(p, x).astype(jnp.float32).mean())
        y = g(params, x)
        mean_out[mode] = float(y)  # compile + warmup
        float(g(params, x))

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                y = g(params, x)
            _ = float(y)
            return time.perf_counter() - t0

        dts = sorted(timed(args.iters) for _ in range(3))
        dt = dts[1]
        results[mode] = args.batch * args.iters / dt
        print(f"{mode}: {results[mode]:.0f} img/s/chip "
              f"({dt / args.iters * 1e3:.2f} ms/batch, "
              f"reps {[round(args.batch * args.iters / d) for d in dts]}, "
              f"mean={mean_out[mode]:.5f})")

    if "bf16" in results:
        for mode, r in results.items():
            if mode != "bf16":
                print(f"{mode} vs bf16: {r / results['bf16']:.3f}x")


if __name__ == "__main__":
    main()
