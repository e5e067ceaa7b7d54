"""Probe: can batch->channel packing lift the C=64 conv past the half-MXU
ceiling?

BENCH.md's inference roofline argument: 64 output channels use half of the
MXU's 128 output lanes, capping bf16 conv throughput at ~98 TF/s on v5e.
If XLA's conv emitter handles feature_group_count=2 as a true block-
diagonal matmul on full lanes, packing two batch halves into a 128-channel
grouped conv would double per-conv throughput. This measures that directly
on a conv3x3 64->64 at the trunk's shape.

Usage: python benchmarks/grouped_conv_probe.py [--batch 128] [--platform cpu]
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
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--reps", type=int, default=30, help="convs chained per iter")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    B, S, C, R = args.batch, args.size, 64, args.reps
    dn = lax.conv_dimension_numbers((B, S, S, C), (3, 3, C, C),
                                    ("NHWC", "HWIO", "NHWC"))

    def chain(conv_fn, x, w):
        def body(h, _):
            return conv_fn(h, w), None
        out, _ = lax.scan(body, x, None, length=R)
        return out.sum()

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32),
                    jnp.bfloat16)

    # (a) plain conv 64->64, batch B
    plain = jax.jit(lambda x_, w_: chain(
        lambda h, ww: lax.conv_general_dilated(
            h, ww, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x_, w_))

    # (b) grouped conv: two batch halves stacked on channels, fgc=2
    x2 = jnp.concatenate([x[:B // 2], x[B // 2:]], axis=-1)  # [B/2,S,S,128]
    w2 = jnp.concatenate([w, w], axis=-1)  # [3,3,64,128] (64 in per group)
    grouped = jax.jit(lambda x_, w_: chain(
        lambda h, ww: lax.conv_general_dilated(
            h, ww, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=2), x_, w_))

    # (c) full 128->128 conv at batch B/2 (2x FLOPs of (a); full lanes) —
    # calibrates what full-width convs achieve at this spatial shape.
    w3 = jnp.asarray(rng.normal(size=(3, 3, 2 * C, 2 * C)).astype(np.float32) * 0.05,
                     jnp.bfloat16)
    full = jax.jit(lambda x_, w_: chain(
        lambda h, ww: lax.conv_general_dilated(
            h, ww, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x_, w_))

    gflop_a = 2 * B * S * S * 9 * C * C * R / 1e9

    def bench(name, fn, *a, gflop=gflop_a):
        float(fn(*a))
        float(fn(*a))
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = fn(*a)
        float(out)
        dt = time.perf_counter() - t0
        tfs = gflop * args.iters / dt / 1e3
        print(f"{name}: {dt / args.iters * 1e3:.2f} ms/iter, {tfs:.1f} TF/s")
        return tfs

    a_tf = bench(f"plain   conv {C}->{C} @B{B}", plain, x, w)
    b_tf = bench(f"grouped conv fgc=2 @B{B // 2}x{2 * C}ch", grouped, x2, w2)
    c_tf = bench(f"full    conv {2 * C}->{2 * C} @B{B // 2}", full, x[:B // 2].repeat(2, -1) * 0 + x2, w3,
                 gflop=2 * gflop_a)
    print(f"grouped/plain: {b_tf / a_tf:.2f}x   full-width/plain: {c_tf / a_tf:.2f}x")

    # numeric check: grouped result == plain result (reordered)
    y_plain = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y_g = lax.conv_general_dilated(x2, w2, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"),
                                   feature_group_count=2)
    import numpy as _np
    top = _np.asarray(y_g[..., :C], _np.float32)
    bot = _np.asarray(y_g[..., C:], _np.float32)
    ref = _np.asarray(y_plain, _np.float32)
    _np.testing.assert_allclose(top, ref[:B // 2], rtol=2e-2, atol=2e-2)
    _np.testing.assert_allclose(bot, ref[B // 2:], rtol=2e-2, atol=2e-2)
    print("numeric parity OK (grouped == plain, batch-reordered)")


if __name__ == "__main__":
    main()
