#!/usr/bin/env python
"""Inference latency microbenchmark — same interface as reference
`scripts/measure_inference_time.py`.

Times the 64x64 -> 256x256 forward with warmup over N runs, reporting
avg/min/max ms and images/sec. Device synchronization: the jitted forward
reduces to an on-device scalar which is fetched per run — the TPU
equivalent of the reference's `torch.cuda.synchronize()` bracketing
(measure_inference_time.py:68-116), robust on tunneled platforms where
block_until_ready returns early.
"""

import argparse
import sys
import time
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Measure SR inference latency")
    parser.add_argument("--checkpoint", "--custom-checkpoint",
                        dest="checkpoint", type=str, default=None,
                        help="Checkpoint to time (default: fresh 6x10x64 model, "
                             "reference default :152-158)")
    parser.add_argument("--transfer-checkpoint", type=str, default=None,
                        help="Also time a transfer-model checkpoint "
                             "(reference measure_inference_time.py:125,171-183)")
    parser.add_argument("--input-size", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-runs", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--bf16", action="store_true", help="bf16 compute")
    parser.add_argument("--int8", action="store_true",
                        help="full-int8 serving path (s8 MXU convs with "
                             "per-image activation scales — BENCH.md)")
    parser.add_argument("--calibrate", type=int, default=0, metavar="N",
                        help="with --int8: calibrate static activation "
                             "scales on N random images (removes the "
                             "per-conv abs-max reduction from the hot path)")
    parser.add_argument("--profile", type=str, default=None,
                        help="Write a jax.profiler trace to this directory")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    from facesr.models import face_enhance_net as fen

    if args.checkpoint:
        from facesr.ckpt import load_model

        cfg, params = load_model(args.checkpoint)
        params = jax.tree.map(jnp.asarray, params)
    else:
        cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10, num_channels=64)
        params = fen.init(jax.random.PRNGKey(0), cfg)

    dtype = jnp.bfloat16 if (args.bf16 or args.int8) else None
    if args.int8 and args.calibrate > 0:
        from facesr.parallel.serving import calibrated_qparams

        calib = np.random.default_rng(1).random(
            (args.calibrate, args.input_size, args.input_size, 3), dtype=np.float32)
        params = jax.device_put(
            calibrated_qparams(
                params, lambda p, x, train, dtype: fen.apply(p, x, cfg, train=train, dtype=dtype),
                calib, max(args.batch_size, 1)),
            jax.devices()[0])
    elif args.int8:
        from facesr.ops.quant import quantize_conv_kernels

        params = quantize_conv_kernels(params)
    fwd = jax.jit(lambda p, x: fen.apply(p, x, cfg, train=False, dtype=dtype).sum())

    x = jnp.asarray(np.random.default_rng(0).random(
        (args.batch_size, args.input_size, args.input_size, 3), dtype=np.float32))

    dev = jax.devices()[0]
    if args.int8:
        prec = "int8_full/calibrated" if args.calibrate else "int8_full"
    else:
        prec = "bf16" if args.bf16 else "f32"
    print(f"Device: {dev.platform} | model {cfg.num_groups}x{cfg.blocks_per_group}"
          f"x{cfg.num_channels} | batch {args.batch_size} | "
          f"input {args.input_size}x{args.input_size} | {prec}")

    def time_model(fwd, params):
        for _ in range(args.warmup):
            float(fwd(params, x))

        if args.profile:
            jax.profiler.start_trace(args.profile)

        times = []
        for _ in range(args.num_runs):
            t0 = time.perf_counter()
            float(fwd(params, x))
            times.append((time.perf_counter() - t0) * 1000)

        if args.profile:
            jax.profiler.stop_trace()
            print(f"Profiler trace written to {args.profile}")

        times = np.asarray(times)
        print(f"\nInference time over {args.num_runs} runs:")
        print(f"  avg: {times.mean():.2f} ms")
        print(f"  min: {times.min():.2f} ms")
        print(f"  max: {times.max():.2f} ms")
        print(f"  p50: {np.percentile(times, 50):.2f} ms")
        print(f"  images/sec: {args.batch_size / (times.mean() / 1000):.1f}")

    time_model(fwd, params)

    # Second timed model, reference measure_inference_time.py:125,171-183
    if args.transfer_checkpoint:
        from facesr.ckpt import load_model
        from facesr.models import transfer as transfer_lib

        tcfg, tparams = load_model(args.transfer_checkpoint, model_type="transfer")
        tparams = jax.tree.map(jnp.asarray, tparams)
        # same serving precision as the first model — the banner above
        # applies to both timed blocks
        t_apply = lambda p, x_, train, dtype: transfer_lib.apply(
            p, x_, tcfg, train=train, dtype=dtype)
        if args.int8 and args.calibrate > 0:
            from facesr.parallel.serving import calibrated_qparams

            calib = np.random.default_rng(1).random(
                (args.calibrate, args.input_size, args.input_size, 3),
                dtype=np.float32)
            tparams = jax.device_put(
                calibrated_qparams(tparams, t_apply, calib,
                                   max(args.batch_size, 1)),
                jax.devices()[0])
        elif args.int8:
            from facesr.ops.quant import quantize_conv_kernels

            tparams = quantize_conv_kernels(tparams)
        print(f"\nTransfer Model (from {args.transfer_checkpoint}): "
              f"{tcfg.backbone_blocks} backbone RRDBs + "
              f"{tcfg.head_blocks}-RCAB head")
        tfwd = jax.jit(lambda p, x_: t_apply(p, x_, False, dtype).sum())
        time_model(tfwd, tparams)


if __name__ == "__main__":
    main()
