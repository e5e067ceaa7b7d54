"""Serving throughput bench: ShardedPredictor bf16 vs int8-weight paths.

Times end-to-end predictor calls (host->device, sharded forward, device->
host) and, separately, the pure on-device forward via scalar sync — the
int8 path's win is weight footprint (4x), not FLOPs (MXU math stays bf16),
so expect ~parity throughput; the row exists to keep the quality/perf
trade honest in BENCH.md.

Usage: python benchmarks/serving_bench.py [--batch 128] [--platform cpu]
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
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from facesr.models import face_enhance_net as fen
    from facesr.parallel.serving import ShardedPredictor
    from facesr.losses.ssim import ssim as ssim_fn

    cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10, num_channels=64)
    model = fen.FaceEnhanceNet(cfg)
    # Non-degenerate output: random conv_last so quantization error is visible.
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1),
                          model.params["conv_last"]["w"].shape) * 0.02)

    rng = np.random.default_rng(0)
    x = rng.random((args.batch, 64, 64, 3), dtype=np.float32)

    results = {}
    outs = {}
    for name, dtype in (("bf16", jnp.bfloat16), ("int8", "int8")):
        pred = ShardedPredictor(model, dtype=dtype, max_batch=args.batch)
        outs[name] = pred(x)  # warmup/compile + quality sample
        pred(x)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred(x)
        dt = time.perf_counter() - t0
        results[name] = args.batch * args.iters / dt
        print(f"{name}: {results[name]:.1f} img/s end-to-end "
              f"({dt / args.iters * 1e3:.1f} ms/call)")

    a = outs["bf16"].astype(np.float64)
    b = outs["int8"].astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    ssim_val = float(ssim_fn(jnp.asarray(outs["int8"], jnp.float32),
                             jnp.asarray(outs["bf16"], jnp.float32)))
    print(f"int8 vs bf16 output: PSNR {psnr:.1f} dB, SSIM {ssim_val:.4f}, "
          f"ratio {results['int8'] / results['bf16']:.3f}x")


if __name__ == "__main__":
    main()
