#!/usr/bin/env python
"""Export a calibrated int8 serving artifact from a trained checkpoint.

Completes the production loop:

    train.py -> export_quantized.py -> api.py --dtype int8_full --quant-cache

Quantizes the model's conv kernels (per-output-channel int8), calibrates
static activation scales on representative LR images (or on LR
synthesized from HR images with the trainer's bicubic, matching the
serving distribution), and writes the tree with
`facesr.parallel.serving.calibrated_qparams` — the same file
`ShardedPredictor(..., quant_cache=...)` and the API's --quant-cache
load, so serving startup never pays the calibration pass. See BENCH.md
for the measured speed/quality trade (1.69x bf16 on v5e).

Usage (the api derives its cache path as `<prefix>.<model_name>.fckpt`
where model_name is the checkpoint's friendly name lowercased/underscored
— name the artifact accordingly, e.g. for best_model.fckpt):
  python scripts/export_quantized.py --checkpoint checkpoints/best_model.fckpt \
      --calib-dir data/processed/val/HR --calib-hr \
      --output quant/int8.best_model.fckpt
  python app/api.py --checkpoint-dir checkpoints --dtype int8_full \
      --quant-cache quant/int8
"""

import argparse
import os
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Export calibrated int8 serving params")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--calib-dir", type=str, required=True,
                        help="directory of images for calibration; HR images "
                             "are downscaled to LR with the trainer's bicubic "
                             "when --calib-hr is set")
    parser.add_argument("--calib-hr", action="store_true",
                        help="treat --calib-dir images as HR and synthesize "
                             "LR (x1/scale bicubic, the trainer's pipeline)")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--num-images", type=int, default=32)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import cv2
    import jax.numpy as jnp

    from facesr.models.load import load_any_model
    from facesr.parallel.serving import calibrated_qparams

    model = load_any_model(args.checkpoint)

    from facesr.data.dataset import _list_images

    calib_dir = Path(args.calib_dir)
    paths = (_list_images(calib_dir) if calib_dir.is_dir() else [])[:args.num_images]
    if not paths:
        raise SystemExit(f"No images found in {args.calib_dir}")
    imgs = []
    for p in paths:
        bgr = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if bgr is None:
            continue
        imgs.append(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0)
    if not imgs:
        raise SystemExit(f"No readable images in {args.calib_dir} "
                         f"({len(paths)} files found, none decoded)")
    imgs = [i for i in imgs if i.shape == imgs[0].shape]  # one uniform batch
    calib = np.stack(imgs)
    if args.calib_hr:
        from facesr.ops import bicubic_down

        calib = np.asarray(bicubic_down(jnp.asarray(calib), args.scale))
    print(f"Calibrating on {len(calib)} images "
          f"({calib.shape[1]}x{calib.shape[2]} LR)...")

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    # Calibrate into a temp path and move it over the output only on
    # success: calibrated_qparams treats an existing cache_path as a cache
    # HIT (so exports must not reuse the final path), and unlinking the old
    # artifact up front would destroy a good artifact if calibration then
    # fails mid-way (unreadable image past the guard, OOM, ...).
    tmp = out.with_name(out.name + ".tmp")
    if tmp.exists():
        tmp.unlink()
    try:
        calibrated_qparams(model.params, model.apply_fn, calib,
                           max_batch=max(len(calib), 1), cache_path=str(tmp))
        if out.exists():
            print(f"Replacing existing artifact {out}")
        os.replace(tmp, out)
    finally:
        if tmp.exists():
            tmp.unlink()
    size = out.stat().st_size / 1e6
    print(f"Wrote calibrated int8 tree to {args.output} ({size:.1f} MB)")
    stem = Path(args.checkpoint).stem.lower().replace(" ", "_")
    print(f"Serve with: python app/api.py --checkpoint-dir <dir> "
          f"--dtype int8_full --quant-cache <prefix>  "
          f"(the api loads <prefix>.{stem}.fckpt for this checkpoint), or "
          f"ShardedPredictor(model, dtype='int8_full', "
          f"quant_cache={args.output!r})")


if __name__ == "__main__":
    main()
