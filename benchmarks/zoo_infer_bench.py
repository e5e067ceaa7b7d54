"""On-chip inference throughput for the non-flagship model zoo.

The headline serving numbers (BENCH.md) are all FaceEnhanceNet; this bench
gives the other two SR families — RRDBNet/ESRGANBaseline (23x64x32, 16.7M
params, reference esrgan.py:17-103) and TransferSRModel (ESRGAN backbone +
RCAB face head, reference transfer.py:94-244) — the same scalar-sync
treatment so model-zoo breadth has hardware evidence too. Methodology is
identical to infer_bench.py: jitted bf16 forward returning an on-device
scalar mean, median-of-3 timed reps (the tunnel's ~100MB/call output fetch
would otherwise dominate; see BENCH.md).

Usage: python benchmarks/zoo_infer_bench.py [--batch 16] [--iters 10]
       [--models rrdbnet,transfer,flagship]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--models", default="rrdbnet,transfer,flagship")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, 64, 64, 3), dtype=np.float32))

    def build(name):
        if name == "rrdbnet":
            from facesr.models import esrgan as esr

            cfg = esr.RRDBNetConfig()  # RealESRGAN_x4plus architecture
            params = esr.init(jax.random.PRNGKey(0), cfg)
            return params, (lambda p, xx: esr.apply(p, xx, cfg, train=False,
                                                    dtype=jnp.bfloat16))
        if name == "transfer":
            from facesr.models import transfer as tr

            cfg = tr.TransferModelConfig()  # production 16-RRDB backbone
            params = tr.init(jax.random.PRNGKey(0), cfg)
            return params, (lambda p, xx: tr.apply(p, xx, cfg, train=False,
                                                   dtype=jnp.bfloat16))
        if name == "flagship":
            from facesr.models import face_enhance_net as fen

            cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10,
                                           num_channels=64)
            model = fen.FaceEnhanceNet(cfg)
            return model.params, (lambda p, xx: model.apply_fn(
                p, xx, train=False, dtype=jnp.bfloat16))
        raise ValueError(name)

    for name in args.models.split(","):
        params, fwd = build(name)
        n_params = sum(np.prod(l.shape) for l in jax.tree.leaves(params))
        g = jax.jit(lambda p, xx: jnp.clip(fwd(p, xx), 0, 1)
                    .astype(jnp.float32).mean())
        t0 = time.perf_counter()
        mean = float(g(params, x))  # compile + warmup
        print(f"{name}: {n_params / 1e6:.2f}M params, "
              f"compile+warmup {time.perf_counter() - t0:.1f}s, "
              f"mean={mean:.5f}")
        float(g(params, x))

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                y = g(params, x)
            _ = float(y)
            return time.perf_counter() - t0

        dts = sorted(timed(args.iters) for _ in range(3))
        dt = dts[1]
        print(f"{name}: {args.batch * args.iters / dt:.0f} img/s/chip "
              f"({dt / args.iters * 1e3:.2f} ms/batch @ {args.batch}, "
              f"reps {[round(args.batch * args.iters / d) for d in dts]})")


if __name__ == "__main__":
    main()
