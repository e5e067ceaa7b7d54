#!/usr/bin/env python
"""Gradio serving demo — same interface as reference `app/demo.py`.

Loads every checkpoint in `checkpoints/`, serves side-by-side comparisons
vs Bicubic/Lanczos4 with live PSNR/SSIM(/LPIPS) on :7860. Input-size
heuristic matches the reference (app/demo.py:244-266): images <= 128 px are
treated as already-LR; larger inputs are center-cropped to 256 and a 64 px
LR is synthesized with the trainer-parity bicubic.

gradio is optional (not in this image) — the module degrades to a CLI
single-image mode so the serving path stays testable.
"""

import argparse
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np
import cv2

try:
    import gradio as gr

    GRADIO_AVAILABLE = True
except ImportError:
    GRADIO_AVAILABLE = False

LR_SIZE = 64
HR_SIZE = 256


def load_models_from_checkpoints(checkpoint_dir: str = "checkpoints") -> dict:
    """Every *.fckpt in the dir, keyed by friendly name (reference :126-152).
    Handles custom/transfer/esrgan checkpoints via the shared loader."""
    from facesr.models.load import load_any_model

    models = {}
    for path in sorted(Path(checkpoint_dir).glob("*.fckpt")):
        try:
            model = load_any_model(str(path))
            name = path.stem.replace("_", " ").title()
            models[name] = model
            print(f"Loaded {name} ({type(model).__name__})")
        except Exception as e:
            print(f"Skipping {path}: {e}")
    return models


def load_exported_servables(exported: str) -> dict:
    """AOT serving artifacts (scripts/export_serving.py) as demo-servable
    callables, keyed by filename stem — weights + precision baked in, no
    checkpoints needed on the demo host (same surface as api --exported).
    Shape/duplicate validation is loud at load time
    (facesr.ckpt.export.load_exported_many)."""
    from facesr.ckpt.export import load_exported_many

    servables = {}
    for name, fn in load_exported_many(exported, spatial=LR_SIZE).items():
        # load_exported already coerces input dtype/placement — no host
        # round-trip needed here
        servables[name] = lambda x, _fn=fn: np.clip(_fn(x), 0, 1)
        print(f"Loaded exported artifact {name}")
    return servables


def _assemble_models(checkpoint_dir: str, dtype: str = None,
                     calib_dir: str = None, quant_cache: str = None,
                     exported: str = None) -> dict:
    """One model-assembly path for the UI and headless modes: checkpoints
    (optional when artifacts are given) -> serving-dtype predictors ->
    exported artifacts, with loud name collisions."""
    servables = load_exported_servables(exported) if exported else {}
    models = (load_models_from_checkpoints(checkpoint_dir)
              if not servables or Path(checkpoint_dir).exists() else {})
    models = wrap_predictors(models, dtype, calib_dir, quant_cache)
    dup = set(models) & set(servables)
    if dup:
        raise ValueError(f"exported artifact name(s) {sorted(dup)} collide "
                         f"with checkpoint model names — rename the artifact")
    models.update(servables)
    return models


def wrap_predictors(models: dict, dtype: str = None, calib_dir: str = None,
                    quant_cache: str = None, max_batch: int = 8,
                    remainder_sizes: tuple = ()) -> dict:
    """Route every model through ShardedPredictor when a serving dtype is
    requested — the single quantized-serving assembly (bf16 / int8
    weight-only / int8_full with optional static-scale calibration) shared
    by this demo and app/api.py's SRService. The reference demo only ever
    serves raw f32 (app/demo.py:268-359); here the demo can exercise the
    deployed quantized path. `remainder_sizes` is the API's pow2 cohort
    ladder (passed through to ShardedPredictor)."""
    if not dtype or dtype == "f32":
        return models
    from facesr.parallel.serving import (ShardedPredictor,
                                         load_calibration_images,
                                         per_model_quant_cache)

    import jax.numpy as jnp

    calibration = None
    if calib_dir and dtype == "int8_full":
        calibration = load_calibration_images(calib_dir)
    jdtype = dtype if dtype.startswith("int8") else jnp.bfloat16
    # calibration/quant-cache artifacts only exist on the int8_full path —
    # plumbing them elsewhere would trigger the loud ignored-arguments
    # warning per model
    return {
        name: ShardedPredictor(
            m, dtype=jdtype, max_batch=max_batch, calibration=calibration,
            remainder_sizes=remainder_sizes,
            quant_cache=per_model_quant_cache(
                quant_cache if dtype == "int8_full" else None, name))
        for name, m in models.items()
    }


def _metrics(sr_uint8: np.ndarray, hr_uint8: np.ndarray, lpips_fn=None) -> dict:
    from facesr.evaluation import peak_signal_noise_ratio, structural_similarity

    m = {
        "psnr": peak_signal_noise_ratio(hr_uint8, sr_uint8, data_range=255),
        "ssim": structural_similarity(hr_uint8, sr_uint8, data_range=255, channel_axis=-1),
    }
    if lpips_fn is not None and lpips_fn.available:
        import jax.numpy as jnp

        m["lpips"] = float(lpips_fn(
            jnp.asarray(sr_uint8[None].astype(np.float32) / 255.0),
            jnp.asarray(hr_uint8[None].astype(np.float32) / 255.0),
        ))
    return m


def prepare_inputs(image_rgb: np.ndarray):
    """Input-size heuristic (reference :244-266): small inputs are LR
    (no ground truth); large inputs are center-cropped to 256 HR and a 64 LR
    is synthesized. Returns (lr_float, hr_uint8_or_None)."""
    import jax.numpy as jnp
    from facesr.ops import bicubic_down

    h, w = image_rgb.shape[:2]
    if max(h, w) <= 2 * LR_SIZE:
        lr = cv2.resize(image_rgb, (LR_SIZE, LR_SIZE), interpolation=cv2.INTER_AREA) \
            if (h, w) != (LR_SIZE, LR_SIZE) else image_rgb
        return lr.astype(np.float32) / 255.0, None

    side = min(h, w)
    top, left = (h - side) // 2, (w - side) // 2
    hr = image_rgb[top:top + side, left:left + side]
    if side != HR_SIZE:
        hr = cv2.resize(hr, (HR_SIZE, HR_SIZE), interpolation=cv2.INTER_AREA)
    lr = np.asarray(bicubic_down(jnp.asarray(hr[None].astype(np.float32) / 255.0), 4))[0]
    return lr, hr


def process_image(image_rgb: np.ndarray, model, lpips_fn=None):
    """SR vs OpenCV baselines + metric text (reference :268-359)."""
    import jax.numpy as jnp

    lr, hr = prepare_inputs(image_rgb)
    sr = np.asarray(model(jnp.asarray(lr[None], jnp.float32)))[0]
    sr_uint8 = (np.clip(sr, 0, 1) * 255).round().astype(np.uint8)
    lr_uint8 = (np.clip(lr, 0, 1) * 255).round().astype(np.uint8)
    out_size = (sr_uint8.shape[1], sr_uint8.shape[0])
    bicubic = cv2.resize(lr_uint8, out_size, interpolation=cv2.INTER_CUBIC)
    lanczos = cv2.resize(lr_uint8, out_size, interpolation=cv2.INTER_LANCZOS4)

    text = "No ground truth (input treated as LR) — metrics unavailable."
    if hr is not None:
        rows = []
        for name, img in (("Bicubic", bicubic), ("Lanczos4", lanczos), ("Model", sr_uint8)):
            m = _metrics(img, hr, lpips_fn)
            row = f"{name}: PSNR {m['psnr']:.2f} dB, SSIM {m['ssim']:.4f}"
            if "lpips" in m:
                row += f", LPIPS {m['lpips']:.4f}"
            rows.append(row)
        text = "\n".join(rows)

    return {"lr": lr_uint8, "bicubic": bicubic, "lanczos": lanczos,
            "sr": sr_uint8, "hr": hr, "metrics_text": text}


def create_demo(checkpoint_dir: str = "checkpoints", sample_dir: str = None,
                dtype: str = None, calib_dir: str = None,
                quant_cache: str = None, exported: str = None):
    """Build the Gradio Blocks UI (reference :396-501): model vs Bicubic vs
    Lanczos4 side-by-side with per-method metric rows and a validation
    sample picker (reference :268-393)."""
    import random

    from facesr.evaluation.metrics import LPIPS

    models = _assemble_models(checkpoint_dir, dtype, calib_dir, quant_cache,
                              exported)
    if not models:
        raise RuntimeError(f"No checkpoints found in {checkpoint_dir} "
                           f"(and no --exported artifacts)")
    lpips_fn = LPIPS()
    model_names = list(models)

    samples = []
    if sample_dir and Path(sample_dir).exists():
        samples = sorted(
            str(p) for ext in ("png", "jpg", "jpeg", "bmp")
            for p in Path(sample_dir).glob(f"*.{ext}"))

    def run(image, model_name):
        if image is None:
            return None, None, None, None, "Upload an image first."
        res = process_image(image, models[model_name], lpips_fn)
        return (res["bicubic"], res["lanczos"], res["sr"], res["hr"],
                res["metrics_text"])

    def random_sample():
        # tolerate corrupt files in the sample dir (globbed by extension
        # only) — skip unreadable picks instead of crashing the callback
        for path in random.sample(samples, k=min(len(samples), 8)):
            bgr = cv2.imread(path)
            if bgr is not None:
                return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        return None

    with gr.Blocks(title="Face Super-Resolution (TPU)") as demo:
        gr.Markdown("# Face Super-Resolution — 4x (64 -> 256), TPU-native")
        if dtype and dtype != "f32":
            # calibration only applies to the int8_full path (wrap_predictors
            # ignores --calib-dir otherwise) — don't claim it elsewhere;
            # exported artifacts serve their own BAKED precision, so the
            # banner must not overclaim for them either
            gr.Markdown(f"Serving dtype: `{dtype}`"
                        + (" (calibrated static scales)"
                           if calib_dir and dtype == "int8_full" else "")
                        + (" — exported artifacts serve their baked "
                           "precision instead" if exported else ""))
        with gr.Row():
            with gr.Column():
                inp = gr.Image(label="Input image (LR or HR)", type="numpy")
                model_sel = gr.Dropdown(model_names, value=model_names[0], label="Model")
                btn = gr.Button("Enhance")
                if samples:
                    sample_btn = gr.Button("Random validation sample")
                    gr.Examples(samples[:16], inputs=inp, label="Validation samples")
            with gr.Column():
                out_bicubic = gr.Image(label="Bicubic")
                out_lanczos = gr.Image(label="Lanczos4")
                out_sr = gr.Image(label="Super-Resolution")
                out_hr = gr.Image(label="Ground truth (if available)")
                out_text = gr.Textbox(label="Metrics (per method)")
        btn.click(run, inputs=[inp, model_sel],
                  outputs=[out_bicubic, out_lanczos, out_sr, out_hr, out_text])
        if samples:
            sample_btn.click(random_sample, inputs=[], outputs=[inp])
    return demo


def main():
    parser = argparse.ArgumentParser(description="Face SR demo server")
    parser.add_argument("--checkpoint-dir", type=str, default="checkpoints")
    parser.add_argument("--sample-dir", type=str, default="data/processed/val/HR")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--share", action="store_true")
    parser.add_argument("--image", type=str, default=None,
                        help="Headless mode: process one image and exit "
                             "(works without gradio)")
    parser.add_argument("--output", type=str, default="outputs/demo")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--dtype", type=str, default=None,
                        choices=["f32", "bf16", "int8", "int8_full"],
                        help="serving dtype: route models through the "
                             "production ShardedPredictor path (same as "
                             "app/api.py --dtype)")
    parser.add_argument("--calib-dir", type=str, default=None,
                        help="representative LR images for int8_full "
                             "static activation-scale calibration")
    parser.add_argument("--quant-cache", type=str, default=None,
                        help="path prefix persisting calibrated int8 trees "
                             "so demo restarts skip calibration")
    parser.add_argument("--exported", type=str, default=None,
                        help="comma-separated AOT serving artifacts "
                             "(scripts/export_serving.py) added to the "
                             "model picker — no checkpoints needed")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.image:
        from facesr.evaluation.metrics import LPIPS

        models = _assemble_models(args.checkpoint_dir, args.dtype,
                                  args.calib_dir, args.quant_cache,
                                  args.exported)
        if not models:
            print(f"No checkpoints in {args.checkpoint_dir} "
                  f"(and no --exported artifacts)")
            return
        name = next(iter(models))
        bgr = cv2.imread(args.image)
        if bgr is None:
            print(f"Cannot read image {args.image}")
            return
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        res = process_image(img, models[name], LPIPS())
        out = Path(args.output)
        out.mkdir(parents=True, exist_ok=True)
        for key in ("lr", "bicubic", "lanczos", "sr", "hr"):
            if res.get(key) is not None:
                cv2.imwrite(str(out / f"{key}.png"),
                            cv2.cvtColor(res[key], cv2.COLOR_RGB2BGR))
        print(f"[{name}]\n{res['metrics_text']}")
        print(f"Outputs in {out}")
        return

    if not GRADIO_AVAILABLE:
        print("gradio is not installed; use --image for headless mode.")
        return
    demo = create_demo(args.checkpoint_dir, args.sample_dir,
                       dtype=args.dtype, calib_dir=args.calib_dir,
                       quant_cache=args.quant_cache, exported=args.exported)
    demo.launch(server_port=args.port, share=args.share)


if __name__ == "__main__":
    main()
