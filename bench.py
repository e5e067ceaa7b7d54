"""Headline benchmark: 4x SR (64->256) inference throughput per chip.

Runs the production FaceEnhanceNet (6 groups x 10 RCABs x 64 channels —
the config behind the reference's published metrics,
configs/stages/stage1_psnr_config.yaml) in bf16 on the available
accelerator, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

The reference never published inference throughput
(BASELINE.md: "not published"; its scripts/measure_inference_time.py exists
but no recorded numbers). REF_GPU_IMGS_PER_SEC below is therefore an
*estimate* of the reference PyTorch model on its RunPod-class GPU
(~45 GFLOP/image at fp32 on a mid-range card), used only to report a
vs_baseline ratio; the BASELINE.json north star is >=5x that.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REF_GPU_IMGS_PER_SEC = 200.0  # documented estimate (see module docstring)

# Measured floor anchor: the same 6x10x64 network (torch-functional oracle
# from tests/test_convert_parity.py) under torch on THIS host's CPU
# (1 thread, batch 4): 0.84 img/s (2026-08-16). Gives vs_baseline a
# defensible measured floor alongside the GPU estimate above.
TORCH_CPU_HOST_IMGS_PER_SEC = 0.84


def _preflight(total_budget_s: float = 600.0, attempt_timeout_s: float = 90.0) -> bool:
    """Bounded probe that the default backend can actually run a tiny jit.

    The axon tunnel goes fully down for extended periods (CLAUDE.md
    2026-08-18; VERDICT r3: jax.devices() hung, driver recorded rc=1/124
    with no way to tell "tunnel down" from "code broken"). Probing
    IN-PROCESS would hang unkillably inside backend init, so each attempt
    is a subprocess running a tiny matmul with a hard timeout, retried
    for up to `total_budget_s`. Returns True when an attempt succeeds."""
    import subprocess
    import sys

    deadline = time.monotonic() + total_budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "x = jnp.ones((256, 256)); "
                 "print(float(jax.jit(lambda a: (a @ a).sum())(x)))"],
                capture_output=True, text=True, timeout=attempt_timeout_s,
            )
            if proc.returncode == 0:
                return True
            err = proc.stderr.strip().splitlines()[-1:] or ["(no stderr)"]
            print(f"# preflight attempt {attempt} failed: {err[0]}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"# preflight attempt {attempt} timed out "
                  f"({attempt_timeout_s:.0f}s)", flush=True)
        if time.monotonic() + 30.0 > deadline:
            return False
        time.sleep(30.0)


def main() -> None:
    if not _preflight():
        # parseable diagnostic so the driver record distinguishes "tunnel
        # down" from "code broken" (the code path was never reached)
        print(json.dumps({
            "metric": "images_per_sec_64to256_x4_inference_per_chip",
            "value": None,
            "unit": "images/sec/chip",
            "vs_baseline": None,
            "error": "tpu_unavailable",
            "detail": "default JAX backend failed a tiny-jit preflight "
                      "for 10 min (axon tunnel down); bench not run",
        }))
        return

    from facesr.models import face_enhance_net as fen

    cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10, num_channels=64)
    params = fen.init(jax.random.PRNGKey(0), cfg)

    dev = jax.devices()[0]
    on_tpu = dev.platform in ("tpu", "axon")
    dtype = jnp.bfloat16 if on_tpu else None
    # batch sweep on v5e-1: 32 -> 1184 img/s, 64 -> 1199, 128 -> 2064;
    # serve at 128 to amortize per-step overhead.
    batch = 128 if on_tpu else 4

    # The forward reduces to a scalar on-device: fetching that scalar forces
    # full execution (block_until_ready is unreliable on tunneled platforms
    # and fetching the 25MB image output would time the transfer, not the
    # compute).
    fwd = jax.jit(lambda p, x: fen.apply(p, x, cfg, train=False, dtype=dtype).sum())

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 64, 64, 3), dtype=np.float32))
    params = jax.device_put(params, dev)
    x = jax.device_put(x, dev)

    # Warmup / compile
    float(fwd(params, x))
    float(fwd(params, x))

    # Median of 3 repetitions: run-to-run variance on the shared tunneled
    # chip is ~15% (BENCH.md), a single rep made the recorded number soft.
    iters = 30 if on_tpu else 5
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(params, x)
        float(out)  # device queue is in-order: last scalar gates all iters
        dt = time.perf_counter() - t0
        rates.append(batch * iters / dt)
    imgs_per_sec = sorted(rates)[1]

    # Full-int8 serving paths (s8 MXU convs — BENCH.md round 2): measured on
    # TPU only; adds compiles, so skipped on CPU smoke runs.
    int8_rate = int8_cal_rate = None
    if on_tpu:
        from facesr.ops.quant import quantize_conv_kernels
        from facesr.parallel.serving import calibrated_qparams

        def time_params(p):
            # same jitted fwd: jax.jit retraces per distinct params pytree
            float(fwd(p, x))
            float(fwd(p, x))
            r8 = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fwd(p, x)
                float(out)
                r8.append(batch * iters / (time.perf_counter() - t0))
            return sorted(r8)[1]

        int8_rate = time_params(jax.device_put(quantize_conv_kernels(params), dev))

        # Calibrated static activation scales: the fastest serving path
        # (+31.7% over bf16 measured within-session, BENCH.md). Calibration
        # is tiny here — 2 random images at 32x32 — because the stats are
        # per-site scalars (resolution-independent) and the axon tunnel
        # forces the calibration forward onto the host CPU (no io_callback
        # support); the compiled serving program's SPEED is independent of
        # the scale values, so small calibration keeps this honest & cheap.
        calib = rng.random((2, 32, 32, 3), dtype=np.float32)
        apply_like = lambda p, xx, train, dtype: fen.apply(p, xx, cfg, train=train, dtype=dtype)
        qp_cal = jax.device_put(
            calibrated_qparams(jax.tree.map(np.asarray, params), apply_like, calib, 2), dev)
        int8_cal_rate = time_params(qp_cal)

    # Architecture-constrained roofline (BENCH.md): ~45 GFLOP/image, and the
    # 64-channel convs half-utilize the MXU's 128-wide output dimension,
    # capping bf16 at ~98 TF/s on v5e => ~2180 img/s/chip ceiling.
    gflop_per_image = 45.0
    ceiling_imgs_per_sec = 98e12 / (gflop_per_image * 1e9)
    print(json.dumps({
        "metric": "images_per_sec_64to256_x4_inference_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / REF_GPU_IMGS_PER_SEC, 3),
        "mxu_ceiling_utilization": round(imgs_per_sec / ceiling_imgs_per_sec, 3)
        if on_tpu else None,
        "vs_torch_cpu_host_measured": round(
            imgs_per_sec / TORCH_CPU_HOST_IMGS_PER_SEC, 1),
        "int8_full_imgs_per_sec": round(int8_rate, 2) if int8_rate else None,
        "int8_calibrated_imgs_per_sec": round(int8_cal_rate, 2)
        if int8_cal_rate else None,
        "reps_imgs_per_sec": [round(r, 1) for r in rates],
    }))


if __name__ == "__main__":
    main()
