#!/usr/bin/env python
"""Stage-vs-stage face-region crop panel.

Qualitative evidence for the GAN stage (reference README.md:7,88: the
perceptual headline): side-by-side eye/mouth crops from successive stage
checkpoints against bicubic and ground truth — the regions GAN training
sharpens. Complements the metric table from compare_two_models.py, where
stage 3's PSNR dip hides its perceptual gain.

Usage:
  python scripts/stage_panel.py \
      --checkpoints s2/best_model.fckpt s3/best_model.fckpt \
      --labels stage2 stage3 \
      --test-dir /tmp/rehearsal/processed/test/HR \
      --output /tmp/rehearsal/panel --num-images 4
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import cv2

sys.path.insert(0, str(Path(__file__).parent.parent))


def crop_region(img: np.ndarray, box) -> np.ndarray:
    """Crop a (y0, x0, y1, x1)-fraction box out of an HWC image."""
    h, w = img.shape[:2]
    y0, x0, y1, x1 = box
    return img[int(y0 * h):int(y1 * h), int(x0 * w):int(x1 * w)]


def label_strip(img: np.ndarray, text: str) -> np.ndarray:
    """Add a label bar above the image."""
    bar = np.full((22, img.shape[1], 3), 32, np.uint8)
    cv2.putText(bar, text, (4, 16), cv2.FONT_HERSHEY_SIMPLEX, 0.45,
                (255, 255, 255), 1, cv2.LINE_AA)
    return np.vstack([bar, img])


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoints", nargs="+", required=True,
                        help="Stage checkpoints, in curriculum order")
    parser.add_argument("--labels", nargs="+", default=None,
                        help="One label per checkpoint (default: file stems)")
    parser.add_argument("--test-dir", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--num-images", type=int, default=4)
    parser.add_argument("--regions", default="eyes,mouth",
                        help="Comma-separated FACE_REGIONS names")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--zoom", type=int, default=3,
                        help="Nearest-neighbor zoom on the crops")
    parser.add_argument("--seed", type=int, default=0,
                        help="Sample picker seed (images are sampled, not "
                             "the first N — first files are often easiest)")
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    from facesr.ops import bicubic_down
    from facesr.models.load import load_any_model
    from facesr.evaluation.explainability import FACE_REGIONS

    labels = args.labels or [Path(p).parent.name or Path(p).stem
                             for p in args.checkpoints]
    if len(labels) != len(args.checkpoints):
        raise SystemExit("--labels must match --checkpoints")
    # labels key the model/output dicts and the reserved panel columns —
    # a collision would silently drop a checkpoint while the printed
    # column list still advertises it
    reserved = {"bicubic", "GT"}
    bad = {l for l in labels if labels.count(l) > 1} | (set(labels) & reserved)
    if bad:
        raise SystemExit(
            f"Duplicate or reserved labels {sorted(bad)}; pass unique "
            f"--labels (and not {sorted(reserved)})")
    regions = [r.strip() for r in args.regions.split(",") if r.strip()]
    for r in regions:
        if r not in FACE_REGIONS:
            raise SystemExit(f"Unknown region {r!r}; have {list(FACE_REGIONS)}")

    models = {}
    for label, path in zip(labels, args.checkpoints):
        models[label] = load_any_model(path)
        print(f"Loaded {label}: {path}")

    from facesr.data.dataset import _list_images

    test_dir = Path(args.test_dir)
    files = _list_images(test_dir) if test_dir.is_dir() else []
    if not files:
        raise SystemExit(f"No test images in {args.test_dir}")
    rng = np.random.default_rng(args.seed)
    picks = sorted(rng.choice(len(files), size=min(args.num_images, len(files)),
                              replace=False).tolist())
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = []
    for i in picks:
        bgr = cv2.imread(str(files[i]))
        if bgr is None:  # corrupt sample: skip it, keep the panel alive
            print(f"  skipping unreadable image {files[i].name}")
            continue
        hr = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        ch, cw = (hr.shape[0] // args.scale * args.scale,
                  hr.shape[1] // args.scale * args.scale)
        hr = hr[:ch, :cw]
        lr = np.asarray(bicubic_down(
            jnp.asarray(hr[None].astype(np.float32) / 255.0), args.scale))[0]
        lr_u8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)

        outputs = {"bicubic": cv2.resize(lr_u8, (cw, ch),
                                         interpolation=cv2.INTER_CUBIC)}
        for label, model in models.items():
            sr = np.asarray(model(jnp.asarray(lr[None])))[0]
            outputs[label] = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
        outputs["GT"] = hr

        for region in regions:
            box = FACE_REGIONS[region]
            tiles = []
            for name, img in outputs.items():
                crop = crop_region(img, box)
                crop = cv2.resize(crop, (crop.shape[1] * args.zoom,
                                         crop.shape[0] * args.zoom),
                                  interpolation=cv2.INTER_NEAREST)
                tiles.append(label_strip(crop, f"{name} [{region}]"))
            h = max(t.shape[0] for t in tiles)
            tiles = [np.pad(t, ((0, h - t.shape[0]), (0, 2), (0, 0)))
                     for t in tiles]
            rows.append(np.hstack(tiles))
            cv2.imwrite(str(out_dir / f"panel_{files[i].stem}_{region}.png"),
                        cv2.cvtColor(rows[-1], cv2.COLOR_RGB2BGR))

    if not rows:
        raise SystemExit("All sampled test images were unreadable; no panel")
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 4), (0, w - r.shape[1]), (0, 0))) for r in rows]
    panel = np.vstack(rows)
    panel_path = out_dir / "stage_panel.png"
    cv2.imwrite(str(panel_path), cv2.cvtColor(panel, cv2.COLOR_RGB2BGR))
    print(f"Panel saved to {panel_path} "
          f"({len(picks)} images x {len(regions)} regions; "
          f"columns: bicubic, {', '.join(labels)}, GT)")


if __name__ == "__main__":
    main()
