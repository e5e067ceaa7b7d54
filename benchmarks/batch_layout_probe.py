"""Diagnose the batch>128 serving throughput cliff (VERDICT r3 item 7).

BENCH.md records the raw numbers (int8_cal 3122 img/s @128 vs 1669 @192,
2177 @256) with a one-line hypothesis. This probe makes the diagnosis
trace-backed and turns it into production guidance:

1. Within-session A/B: monolithic batch 128/192/256 for bf16 + int8_cal
   (same methodology as benchmarks/infer_bench.py: on-device scalar sync).
2. CHUNKED serving of the same workloads: a 256-image request executed as
   2x the compiled batch-128 program (exactly what ShardedPredictor's
   max_batch=128 default does in production, facesr/parallel/serving.py).
   If chunked throughput ~= the @128 peak, the cliff is a non-problem for
   serving — the predictor already rides the sweet spot.
3. Perfetto traces of the monolithic 128 vs 256 int8_cal programs, parsed
   offline: per-op total device time and its 256/128 scaling ratio. Ops
   scaling >2x (super-linear in batch) are the cliff; ~2x ops are innocent.

Usage (on chip):
  PYTHONPATH=/root/.axon_site:/root/repo python \
      benchmarks/batch_layout_probe.py --trace-dir /tmp/blp_traces
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str) -> dict:
    """Aggregate device-lane op durations from a perfetto/chrome trace dir.

    Returns {op_name: total_dur_us} summed over complete ('X') events on
    TPU/device process lanes (host lanes excluded when identifiable).
    """
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in proc_names.items()
                   if any(k in name.lower() for k in ("tpu", "device", "axon",
                                                      "/device:"))}

    totals: dict = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        totals[e["name"]] += e["dur"]
    return dict(totals)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="128,192,256")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--calib-images", type=int, default=0,
                   help="0 (default): synthetic static scales — compiled "
                        "speed is independent of scale VALUES (BENCH.md), "
                        "and real calibration costs ~8 host-CPU minutes "
                        "on axon; pass N to calibrate for real")
    p.add_argument("--trace-dir", default=None,
                   help="write + parse perfetto traces of the int8_cal "
                        "128/256 programs under this dir")
    p.add_argument("--platform", default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny model + small calib batch: verifies the "
                        "script mechanics on CPU, numbers meaningless")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from facesr.models import face_enhance_net as fen
    from facesr.ops.quant import attach_act_scales, quantize_conv_kernels
    from facesr.parallel.serving import calibrated_qparams

    if args.smoke:
        cfg = fen.FaceEnhanceNetConfig(num_groups=2, blocks_per_group=2,
                                       num_channels=16)
    else:
        cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10,
                                       num_channels=64)
    model = fen.FaceEnhanceNet(cfg)
    model.params["conv_last"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(1),
                          model.params["conv_last"]["w"].shape) * 0.02)
    apply_fn = model.apply_fn
    rng = np.random.default_rng(0)
    batches = [int(b) for b in args.batches.split(",")]
    max_b = max(batches)
    x_all = jnp.asarray(rng.random((max_b, 64, 64, 3), dtype=np.float32))

    if args.calib_images:
        calib = rng.random((args.calib_images, 64, 64, 3), dtype=np.float32)
        calib_batch = min(128, max_b) if args.smoke else 128
        t0 = time.perf_counter()
        qp = calibrated_qparams(model.params, apply_fn, calib, calib_batch)
        print(f"calibration ({args.calib_images} imgs): "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    else:
        qt, n_sites = quantize_conv_kernels(model.params, with_sids=True)
        qp = attach_act_scales(qt, np.full(n_sites, 2.0))
        print(f"synthetic static scales ({n_sites} sites)", flush=True)
    qp = jax.device_put(qp, jax.devices()[0])
    dyn = jax.device_put(quantize_conv_kernels(model.params), jax.devices()[0])

    def scalar_fwd(params, x):
        return jnp.clip(apply_fn(params, x, train=False, dtype=jnp.bfloat16),
                        0, 1).astype(jnp.float32).mean()

    jitted = jax.jit(scalar_fwd)

    def timeit(params, x, iters):
        y = jitted(params, x)
        float(y)  # compile + warmup
        float(jitted(params, x))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                y = jitted(params, x)
            float(y)
            dts.append(time.perf_counter() - t0)
        return sorted(dts)[1] / iters  # median rep, s/batch

    modes = [("bf16", model.params), ("int8_cal", qp), ("int8_dyn", dyn)]
    mono = {}
    print(f"\nmonolithic (iters={args.iters}):")
    for name, params in modes:
        for b in batches:
            dt = timeit(params, x_all[:b], args.iters)
            mono[(name, b)] = b / dt
            print(f"  {name:<9} batch {b:>3}: {b / dt:7.0f} img/s "
                  f"({dt * 1e3:6.2f} ms/batch)", flush=True)

    # Chunked: process max_b images as ceil(max_b/128) calls of the
    # compiled batch-128 program (the ShardedPredictor max_batch path).
    chunk = min(batches) if args.smoke else 128
    print(f"\nchunked as {chunk}-batches (the ShardedPredictor "
          "production path):")
    for name, params in modes:
        for b in batches:
            if b <= chunk:
                continue
            n_full, rem = divmod(b, chunk)
            float(jitted(params, x_all[:chunk]))  # ensure compiled
            if rem:
                float(jitted(params, x_all[:rem]))
            dts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    for i in range(n_full):
                        y = jitted(params, x_all[i * chunk:(i + 1) * chunk])
                    if rem:
                        y = jitted(params, x_all[:rem])
                float(y)
                dts.append(time.perf_counter() - t0)
            dt = sorted(dts)[1] / args.iters
            rate = b / dt
            print(f"  {name:<9} {b} = {n_full}x{chunk}"
                  f"{f'+{rem}' if rem else '':<5}: {rate:7.0f} img/s "
                  f"({rate / mono[(name, b)]:.2f}x monolithic, "
                  f"{rate / mono[(name, chunk)]:.2f}x of the @{chunk} peak)",
                  flush=True)

    if not args.trace_dir:
        return

    # Perfetto traces: int8_cal @ the smallest vs largest batch, per-op.
    b_lo, b_hi = min(batches), max(batches)
    print(f"\ntracing int8_cal @{b_lo} and @{b_hi} ...", flush=True)
    per_op = {}
    for b in (b_lo, b_hi):
        tdir = os.path.join(args.trace_dir, f"b{b}")
        os.makedirs(tdir, exist_ok=True)
        float(jitted(qp, x_all[:b]))  # compiled before tracing
        with jax.profiler.trace(tdir, create_perfetto_trace=True):
            for _ in range(5):
                y = jitted(qp, x_all[:b])
            float(y)
        per_op[b] = parse_trace(tdir)
        print(f"  traced b{b}: {len(per_op[b])} device op names", flush=True)

    a, c = per_op[b_lo], per_op[b_hi]
    lin = b_hi / b_lo
    rows = []
    for name, d_hi in c.items():
        d_lo = a.get(name, 0.0)
        rows.append((d_hi, d_lo, d_hi / d_lo if d_lo else float("inf"), name))
    rows.sort(reverse=True)
    tot_lo, tot_hi = sum(a.values()), sum(c.values())
    print(f"\ndevice time total: @{b_lo} {tot_lo / 5:.0f} us/iter, "
          f"@{b_hi} {tot_hi / 5:.0f} us/iter "
          f"(ratio {tot_hi / tot_lo:.2f}x; linear would be {lin:.2f}x)")
    print(f"{f'op (top 20 by @{b_hi} time)':<56} {f'@{b_lo}us':>8} "
          f"{f'@{b_hi}us':>8} {'ratio':>6}")
    for d_hi, d_lo, ratio, name in rows[:20]:
        print(f"{name[:56]:<56} {d_lo / 5:8.0f} {d_hi / 5:8.0f} {ratio:6.2f}")


if __name__ == "__main__":
    main()
