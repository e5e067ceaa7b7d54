"""Generate a synthetic face-like dataset for end-to-end dress rehearsals.

The reference curriculum (reference README.md:37-55) trains
stage1(PSNR) -> stage2(+SSIM) -> stage3(GAN) on FFHQ. No real face data
exists in this environment, so rehearsals run on procedurally generated
face-like images: elliptical head on a gradient background, two eyes with
irises/highlights, brows, nose shadow, mouth, plus mild texture — enough
spatial structure (smooth regions, sharp edges, fine detail at multiple
scales) that super-resolution training has a real signal and PSNR curves
are meaningful, unlike gaussian-blurred noise.

Deterministic per (--seed, index): re-running produces the same dataset.

Usage:
  python scripts/make_synthetic_faces.py --output /tmp/faces/raw \
      --num 512 --size 160 --seed 0
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render_face(rng: np.random.Generator, size: int) -> np.ndarray:
    """One uint8 RGB face-like image of shape [size, size, 3]."""
    import cv2

    s = size
    # Oversample 2x and downsample at the end: cheap anti-aliasing so the
    # HR ground truth has clean sub-pixel edges worth super-resolving.
    S = s * 2
    img = np.zeros((S, S, 3), np.float32)

    # Background: diagonal two-color gradient.
    c0 = rng.uniform(30, 225, 3)
    c1 = rng.uniform(30, 225, 3)
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32) / (S - 1)
    t = (yy * rng.uniform(0.3, 1.0) + xx * rng.uniform(0.3, 1.0))
    t /= t.max()
    img += c0 * (1 - t[..., None]) + c1 * t[..., None]

    # Head: filled ellipse, slightly rotated, skin-ish but varied color.
    cx, cy = int(S * rng.uniform(0.42, 0.58)), int(S * rng.uniform(0.45, 0.58))
    ax, ay = int(S * rng.uniform(0.26, 0.34)), int(S * rng.uniform(0.32, 0.42))
    angle = rng.uniform(-12, 12)
    skin = np.array([rng.uniform(140, 235), rng.uniform(100, 190), rng.uniform(80, 170)])
    cv2.ellipse(img, (cx, cy), (ax, ay), angle, 0, 360, skin.tolist(), -1,
                lineType=cv2.LINE_AA)
    # Hair: darker cap ellipse clipped to the upper head.
    hair = (skin * rng.uniform(0.15, 0.5)).tolist()
    cv2.ellipse(img, (cx, cy - int(ay * 0.55)), (int(ax * 1.05), int(ay * 0.62)),
                angle, 180, 360, hair, -1, lineType=cv2.LINE_AA)

    # Eyes: sclera + iris + pupil + highlight.
    eye_dx = int(ax * rng.uniform(0.38, 0.5))
    eye_y = cy - int(ay * rng.uniform(0.08, 0.2))
    eye_w = max(3, int(ax * rng.uniform(0.16, 0.22)))
    eye_h = max(2, int(eye_w * rng.uniform(0.45, 0.65)))
    iris = rng.uniform(20, 150, 3).tolist()
    for sx in (-1, 1):
        ex = cx + sx * eye_dx
        cv2.ellipse(img, (ex, eye_y), (eye_w, eye_h), 0, 0, 360,
                    (245, 245, 245), -1, lineType=cv2.LINE_AA)
        r_iris = max(2, int(eye_h * 0.9))
        cv2.circle(img, (ex, eye_y), r_iris, iris, -1, lineType=cv2.LINE_AA)
        cv2.circle(img, (ex, eye_y), max(1, r_iris // 2), (15, 15, 15), -1,
                   lineType=cv2.LINE_AA)
        cv2.circle(img, (ex - r_iris // 3, eye_y - r_iris // 3),
                   max(1, r_iris // 4), (250, 250, 250), -1, lineType=cv2.LINE_AA)
        # Brow.
        bw = int(eye_w * rng.uniform(1.1, 1.4))
        by = eye_y - int(eye_h * rng.uniform(1.8, 2.6))
        cv2.ellipse(img, (ex, by), (bw, max(1, eye_h // 2)), sx * rng.uniform(0, 8),
                    200, 340, hair, max(1, S // 100), lineType=cv2.LINE_AA)

    # Nose: subtle vertical shadow + tip.
    nose_y = cy + int(ay * rng.uniform(0.1, 0.22))
    shade = (skin * 0.8).tolist()
    cv2.line(img, (cx, eye_y + eye_h), (cx, nose_y), shade, max(1, S // 120),
             lineType=cv2.LINE_AA)
    cv2.ellipse(img, (cx, nose_y), (max(2, int(ax * 0.09)), max(1, int(ax * 0.05))),
                0, 0, 180, shade, -1, lineType=cv2.LINE_AA)

    # Mouth: lip ellipse, sometimes open (teeth band).
    mouth_y = cy + int(ay * rng.uniform(0.42, 0.58))
    mw = int(ax * rng.uniform(0.32, 0.48))
    mh = max(2, int(mw * rng.uniform(0.25, 0.4)))
    lip = np.array([rng.uniform(120, 210), rng.uniform(30, 90), rng.uniform(40, 110)])
    cv2.ellipse(img, (cx, mouth_y), (mw, mh), 0, 0, 360, lip.tolist(), -1,
                lineType=cv2.LINE_AA)
    if rng.random() < 0.5:
        cv2.ellipse(img, (cx, mouth_y - mh // 4), (int(mw * 0.7), max(1, mh // 3)),
                    0, 0, 360, (235, 235, 235), -1, lineType=cv2.LINE_AA)

    # Fine texture: low-amplitude noise, then mild blur — gives the HR
    # images high-frequency content so x4 SR is non-trivial.
    img += rng.normal(0, 4.0, img.shape).astype(np.float32)
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    img = cv2.resize(img, (s, s), interpolation=cv2.INTER_AREA)
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--output", required=True, help="directory for PNG images")
    p.add_argument("--num", type=int, default=512)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import cv2

    os.makedirs(args.output, exist_ok=True)
    for i in range(args.num):
        rng = np.random.default_rng((args.seed, i))
        img = render_face(rng, args.size)
        # render_face works in RGB; cv2 writes BGR.
        cv2.imwrite(os.path.join(args.output, f"face_{i:05d}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print(f"wrote {args.num} images ({args.size}x{args.size}) to {args.output}")


if __name__ == "__main__":
    main()
