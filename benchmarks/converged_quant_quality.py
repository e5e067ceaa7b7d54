"""Converged-weight serving-quality validation (VERDICT r3 item 5).

Every int8 quality gate in tests/ uses RANDOM weights — the pessimal
case (round-2 probe: trained weights quantize near-losslessly because
their activation distributions are far narrower). This script re-measures
the serving-precision quality ladder on a CONVERGED model (the dress
rehearsal's checkpoints, scripts/dress_rehearsal.sh) against its own f32
forward on held-out data, producing the numbers BENCH.md's claims rest
on (<0.3 dB int8 loss):

    f32 -> bf16 -> int8 (weight-only) -> int8_full dynamic
        -> int8_full calibrated (static scales)

LR inputs are synthesized from HR via the trainer-matched bicubic
(scripts/test_model.py:60-68 semantics); metrics are the skimage-
compatible PSNR/SSIM at data_range=255 the eval CLIs report.

Usage (on chip):
  PYTHONPATH=/root/.axon_site:/root/repo python \
      benchmarks/converged_quant_quality.py \
      --checkpoint /tmp/rehearsal/ckpt_s1/best_model.fckpt \
      --test-dir /tmp/rehearsal/processed/test/HR --calibrate 8
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--test-dir", required=True, help="directory of HR images")
    p.add_argument("--num-images", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--calibrate", type=int, default=8,
                   help="images for int8_full static-scale calibration "
                        "(0 skips the calibrated row)")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from facesr.data.dataset import _list_images, _read_rgb
    from facesr.evaluation import (peak_signal_noise_ratio,
                                   structural_similarity)
    from facesr.models.load import load_any_model
    from facesr.ops import bicubic_down
    from facesr.parallel.serving import ShardedPredictor

    model = load_any_model(args.checkpoint)
    scale = getattr(model.config, "scale_factor", 4)
    print(f"model: {type(model).__name__} ({model.config})")

    files = _list_images(Path(args.test_dir))[: args.num_images]
    if not files:
        sys.exit(f"no images under {args.test_dir}")
    hrs = np.stack([_read_rgb(Path(f)) for f in files])  # uint8 [N,H,W,3]
    lrs = np.asarray(
        bicubic_down(jnp.asarray(hrs.astype(np.float32) / 255.0), scale))
    print(f"{len(files)} images: HR {hrs.shape[1:]} -> LR {lrs.shape[1:]}")

    calibration = lrs[: args.calibrate] if args.calibrate else None

    modes = [("f32", None, None), ("bf16", jnp.bfloat16, None),
             ("int8 weight-only", "int8", None),
             ("int8_full dynamic", "int8_full", None)]
    if calibration is not None:
        modes.append(("int8_full calibrated", "int8_full", calibration))

    results = {}
    for name, dtype, calib in modes:
        pred = ShardedPredictor(model, dtype=dtype, max_batch=args.batch,
                                calibration=calib)
        srs = []
        for i in range(0, len(lrs), args.batch):
            srs.append(np.asarray(pred(lrs[i:i + args.batch]), np.float32))
        sr_uint8 = (np.clip(np.concatenate(srs), 0, 1) * 255
                    ).round().astype(np.uint8)
        psnr = float(np.mean([
            peak_signal_noise_ratio(h, s, data_range=255)
            for h, s in zip(hrs, sr_uint8)]))
        ssim = float(np.mean([
            structural_similarity(h, s, data_range=255, channel_axis=-1)
            for h, s in zip(hrs, sr_uint8)]))
        results[name] = (psnr, ssim)
        print(f"{name:<22} PSNR {psnr:.3f} dB  SSIM {ssim:.4f}", flush=True)

    base_psnr, base_ssim = results["f32"]
    print(f"\nvs f32 ({base_psnr:.3f} dB / {base_ssim:.4f}):")
    for name, (psnr, ssim) in results.items():
        if name == "f32":
            continue
        print(f"  {name:<22} dPSNR {psnr - base_psnr:+.3f} dB  "
              f"dSSIM {ssim - base_ssim:+.4f}")


if __name__ == "__main__":
    main()
