#!/usr/bin/env python
"""Model evaluation CLI (single image or directory) — same interface as
reference `scripts/test_model.py`.

Usage:
    python scripts/test_model.py --checkpoint checkpoints/best_model.fckpt \
        --input data/processed/test/HR --output outputs/test

LR synthesis matches the trainer exactly (on-device PyTorch-parity bicubic
x0.25 — reference test_model.py:139-156); metrics are skimage-compatible
PSNR/SSIM on uint8 range-255 images (reference :193-202); a bicubic
(cv2.INTER_CUBIC) baseline is reported alongside (reference :231-233).
"""

import argparse
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np
import cv2


def load_model(checkpoint_path: str, config_yaml: str | None = None):
    """Load any facesr checkpoint (custom/transfer/esrgan) via the shared
    type-dispatching loader; architecture comes from checkpoint metadata
    (with shape inference as fallback — checkpoints are self-describing).

    `config_yaml`: explicit model config override (reference
    test_model.py --config, :82-136) — the `model.custom` section of a
    training YAML; useful for checkpoints converted from bare state
    dicts."""
    from facesr.models.load import load_any_model

    if not Path(checkpoint_path).exists():
        sys.exit(f"Error: checkpoint not found: {checkpoint_path}")
    model = load_any_model(checkpoint_path)
    if config_yaml:
        import yaml
        from facesr.models.face_enhance_net import (
            FaceEnhanceNet, FaceEnhanceNetConfig)

        with open(config_yaml) as f:
            y = yaml.safe_load(f) or {}
        section = (y.get("model", {}) or {}).get("custom", y)
        known = {k: v for k, v in section.items()
                 if k in FaceEnhanceNetConfig.__dataclass_fields__}
        # reference YAML spells scale 'upscale_factor'
        if "upscale_factor" in section:
            known["scale_factor"] = section["upscale_factor"]
        if known:
            model = FaceEnhanceNet(config=FaceEnhanceNetConfig(**known),
                                   params=model.params)
    print(f"Loaded model: {type(model).__name__} ({model.config})")
    return model


def generate_lr(hr_uint8: np.ndarray, scale: int = 4) -> np.ndarray:
    """Trainer-matched LR synthesis: float [0,1], PyTorch-parity bicubic
    downsample (NOT cv2) — reference test_model.py:139-156."""
    import jax.numpy as jnp
    from facesr.ops import bicubic_down

    hr = hr_uint8.astype(np.float32) / 255.0
    lr = bicubic_down(jnp.asarray(hr[None]), scale)
    return np.asarray(lr)[0]


def compute_metrics(sr_uint8: np.ndarray, hr_uint8: np.ndarray) -> dict:
    """skimage-compatible PSNR/SSIM at data_range=255 (reference :193-202)."""
    from facesr.evaluation import peak_signal_noise_ratio, structural_similarity

    return {
        "psnr": peak_signal_noise_ratio(hr_uint8, sr_uint8, data_range=255),
        "ssim": structural_similarity(hr_uint8, sr_uint8, data_range=255, channel_axis=-1),
    }


def test_single_image(model, hr_path: Path, output_dir: Path, scale: int = 4,
                      save_comparison: bool = True) -> dict:
    import jax.numpy as jnp

    from facesr.data.dataset import _read_rgb

    hr = _read_rgb(hr_path)

    lr = generate_lr(hr, scale)
    sr = np.asarray(model(jnp.asarray(lr[None])))[0]
    sr_uint8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)

    metrics = compute_metrics(sr_uint8, hr)

    # Bicubic baseline from the same LR (cv2 upsample, reference :231-233)
    lr_uint8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
    bicubic = cv2.resize(lr_uint8, (hr.shape[1], hr.shape[0]), interpolation=cv2.INTER_CUBIC)
    bicubic_metrics = compute_metrics(bicubic, hr)

    if output_dir is not None:
        output_dir.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(output_dir / f"{hr_path.stem}_sr.png"),
                    cv2.cvtColor(sr_uint8, cv2.COLOR_RGB2BGR))
        if save_comparison:
            lr_up = cv2.resize(lr_uint8, (hr.shape[1], hr.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
            comparison = np.hstack([lr_up, bicubic, sr_uint8, hr])
            cv2.imwrite(str(output_dir / f"{hr_path.stem}_comparison.png"),
                        cv2.cvtColor(comparison, cv2.COLOR_RGB2BGR))

    return {"model": metrics, "bicubic": bicubic_metrics, "file": hr_path.name}


def _save_and_score(files, hrs, lrs, srs, output_dir: Path,
                    no_comparison: bool, no_save: bool = False) -> list:
    """Per-image metrics + artifacts for a batched chunk (same outputs as
    test_single_image)."""
    rows = []
    for f, hr, lr, sr_uint8 in zip(files, hrs, lrs, srs):
        metrics = compute_metrics(sr_uint8, hr)
        lr_uint8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
        bicubic = cv2.resize(lr_uint8, (hr.shape[1], hr.shape[0]),
                             interpolation=cv2.INTER_CUBIC)
        r = {"model": metrics, "bicubic": compute_metrics(bicubic, hr),
             "file": f.name}
        rows.append(r)
        if no_save:
            _print_row(r)
            continue
        cv2.imwrite(str(output_dir / f"{f.stem}_sr.png"),
                    cv2.cvtColor(sr_uint8, cv2.COLOR_RGB2BGR))
        if not no_comparison:
            lr_up = cv2.resize(lr_uint8, (hr.shape[1], hr.shape[0]),
                               interpolation=cv2.INTER_NEAREST)
            comparison = np.hstack([lr_up, bicubic, sr_uint8, hr])
            cv2.imwrite(str(output_dir / f"{f.stem}_comparison.png"),
                        cv2.cvtColor(comparison, cv2.COLOR_RGB2BGR))
        _print_row(r)
    return rows


def _print_row(r: dict) -> None:
    print(f"{r['file']}: model PSNR {r['model']['psnr']:.2f} dB "
          f"SSIM {r['model']['ssim']:.4f} | bicubic PSNR "
          f"{r['bicubic']['psnr']:.2f} dB SSIM {r['bicubic']['ssim']:.4f}")


def main():
    parser = argparse.ArgumentParser(description="Test Face Super-Resolution Model")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--exported", type=str, default=None,
                        help="evaluate an AOT serving artifact "
                             "(scripts/export_serving.py) instead of a "
                             "checkpoint — QA the exact deployed program. "
                             "The artifact's spatial input size must match "
                             "the dataset's LR size (HR / scale).")
    parser.add_argument("--config", type=str, default=None,
                        help="Explicit model config YAML override "
                             "(reference test_model.py --config)")
    parser.add_argument("--input", "--image", "--hr-dir", dest="input",
                        type=str, required=True,
                        help="HR image file or directory (reference spells "
                             "this --image / --hr-dir)")
    parser.add_argument("--output", "--output-dir", dest="output",
                        type=str, default="outputs/test_results")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--max-images", "--num-images", dest="max_images",
                        type=int, default=None)
    parser.add_argument("--no-comparison", action="store_true")
    parser.add_argument("--no-save", action="store_true",
                        help="Do not save output images (metrics only; "
                             "reference test_model.py:353-354)")
    parser.add_argument("--per-image", action="store_true",
                        help="Legacy batch-1 forwards instead of the batched "
                             "sharded path (identical metrics, ~10x slower "
                             "on large directories)")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Compiled batch size for the batched path")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu)")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if not args.checkpoint and not args.exported:
        parser.error("one of --checkpoint / --exported is required")
    artifact = None
    if args.exported:
        from facesr.ckpt.export import load_exported

        art_fn = load_exported(args.exported)
        artifact = lambda b: np.clip(art_fn(np.asarray(b, np.float32)), 0, 1)

        class _ArtifactModel:
            def __call__(self, x):
                return artifact(x)

        model = _ArtifactModel()
        print(f"Evaluating exported artifact {args.exported}")
    else:
        model = load_model(args.checkpoint, config_yaml=args.config)
    input_path = Path(args.input)
    output_dir = Path(args.output)

    if input_path.is_file():
        files = [input_path]
    else:
        from facesr.data.dataset import _list_images

        files = _list_images(input_path)  # all extensions, case-insensitive
    if args.max_images:
        files = files[: args.max_images]
    if not files:
        print(f"No images found at {input_path}")
        return

    print(f"\nTesting on {len(files)} image(s)...\n")
    results = []
    if args.per_image or len(files) == 1:  # no point padding one image
        for f in files:
            r = test_single_image(model, f,
                                  None if args.no_save else output_dir,
                                  args.scale,
                                  save_comparison=not args.no_comparison)
            results.append(r)
            _print_row(r)
    else:
        # Batched path: one padded/chunked sharded forward per image shape
        # (facesr.evaluation.batched) — identical per-image metrics. Outer
        # macro-chunks bound host memory on reference-scale directories.
        from facesr.evaluation.batched import (
            make_predictor, sr_batched, synthesize_lr_batched)

        from facesr.data.dataset import _read_rgb

        # artifacts carry their own compiled program — batch straight
        # through them (symbolic batch dim); checkpoints go through the
        # sharded predictor
        predictor = (artifact if artifact is not None
                     else make_predictor(model, max_batch=args.batch_size))
        output_dir.mkdir(parents=True, exist_ok=True)
        for start in range(0, len(files), 256):
            chunk_files = files[start:start + 256]
            hrs = [_read_rgb(f)
                   for f in chunk_files]
            lrs = synthesize_lr_batched(hrs, args.scale)
            srs = sr_batched(model, lrs, predictor=predictor)
            results.extend(_save_and_score(chunk_files, hrs, lrs, srs,
                                           output_dir, args.no_comparison,
                                           no_save=args.no_save))

    m_psnr = np.mean([r["model"]["psnr"] for r in results])
    m_ssim = np.mean([r["model"]["ssim"] for r in results])
    b_psnr = np.mean([r["bicubic"]["psnr"] for r in results])
    b_ssim = np.mean([r["bicubic"]["ssim"] for r in results])

    print("\n" + "=" * 60)
    print(f"{'Method':<12} {'PSNR (dB)':<12} {'SSIM':<10}")
    print("-" * 60)
    print(f"{'Bicubic':<12} {b_psnr:<12.2f} {b_ssim:<10.4f}")
    print(f"{'Model':<12} {m_psnr:<12.2f} {m_ssim:<10.4f}")
    print("-" * 60)
    print(f"vs bicubic: {m_psnr - b_psnr:+.2f} dB PSNR, {m_ssim - b_ssim:+.4f} SSIM")
    print("=" * 60)
    if not args.no_save:
        print(f"\nResults saved to {output_dir}")


if __name__ == "__main__":
    main()
