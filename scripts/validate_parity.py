#!/usr/bin/env python
"""Parity-acceptance harness: reference .pth artifacts -> pass/fail table.

One command turns a directory of published PyTorch artifacts into the
BASELINE acceptance verdict (reference README.md:76-88: PSNR/SSIM/LPIPS on
the FFHQ test split within 0.1 dB / 0.001 / 0.002 of the published
checkpoints). It chains what previously needed four hand-run steps:

    classify + convert every .pth  (facesr.ckpt.convert)
    -> batched sharded evaluation vs the OpenCV baselines
       (reference scripts/compare_two_models.py:337-422 conventions:
        skimage PSNR/SSIM at data_range=255, lpips-AlexNet)
    -> optional FID (reference src/evaluation/metrics.py:227-270)
    -> optional int8 serving-quality deltas vs each model's own f32 forward
    -> PASS/FAIL per (row, metric) against the tolerance targets

Artifacts are classified by state-dict key sniffing, not filename:
FaceEnhanceNet / TransferSRModel / RRDBNet checkpoints become model rows;
torchvision vgg19 is converted for the perceptual loss; torchvision
alexnet + lpips lin-heads enable the LPIPS column; pt_inception /
inception_v3 enables FID. Pre-converted .fckpt model files are used as-is.

Runs today on synthetic fixtures (tests/test_scripts_e2e.py drives it end
to end on oracle-generated .pth files); when the real artifacts appear the
same command is the acceptance gate:

  python scripts/validate_parity.py --artifacts /path/to/pth_dir \
      --test-dir /data/ffhq/test/HR --output outputs/parity --int8

Targets default to the BASELINE.md published table (baselines by name,
models fuzzy-matched on the checkpoint stem); --targets JSON overrides;
--emit-targets writes the measured values as a targets file instead of
checking (the self-consistency mode the e2e test uses).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import numpy as np

# Published reference numbers (BASELINE.md <- reference README.md:81-86).
DEFAULT_TARGETS = {
    "Bilinear": {"psnr": 26.43, "ssim": 0.7843, "lpips": 0.3407},
    "Bicubic": {"psnr": 26.31, "ssim": 0.7861, "lpips": 0.3716},
    "Lanczos4": {"psnr": 26.10, "ssim": 0.7754, "lpips": 0.3883},
    "transfer": {"psnr": 26.97, "ssim": 0.7940, "lpips": 0.1081},
    "custom": {"psnr": 26.39, "ssim": 0.7734, "lpips": 0.0695},
}
DEFAULT_TOLERANCES = {"psnr": 0.1, "ssim": 0.001, "lpips": 0.002}


# ---------------------------------------------------------------------------
# Artifact classification / conversion
# ---------------------------------------------------------------------------

def classify_state_dict(sd) -> str | None:
    """Identify a reference-format state dict by its key fingerprint."""
    keys = sd.keys()
    if any(k.startswith("residual_groups.0.blocks.0.") for k in keys):
        return "custom"
    if any(k.startswith("backbone.body.0.") for k in keys):
        return "transfer"
    if any(k.startswith("body.0.rdb1.") for k in keys):
        return "rrdbnet"
    if "Mixed_5b.branch1x1.conv.weight" in keys:
        return "inception"
    if "lin0.model.1.weight" in keys or "lins.0.model.1.weight" in keys:
        return "lpips_lins"
    # torchvision vgg19.features has convs up to index 34; alexnet stops at
    # 10 — check the deeper net first (their shallow keys overlap)
    prefix = "features." if any(k.startswith("features.") for k in keys) else ""
    if f"{prefix}19.weight" in keys or f"{prefix}34.weight" in keys:
        return "vgg19"
    if f"{prefix}10.weight" in keys and f"{prefix}12.weight" not in keys:
        return "alexnet"
    return None


def discover_and_convert(artifacts_dir: Path, work_dir: Path):
    """Scan artifacts, convert each recognized .pth, return the inventory:
    {"models": {stem: fckpt path}, "lpips": path|None,
     "inception": path|None, "vgg19": path|None, "skipped": [names]}
    """
    from facesr.ckpt.convert import convert_pth, load_torch_state_dict

    work_dir.mkdir(parents=True, exist_ok=True)
    inv = {"models": {}, "lpips": None, "inception": None, "vgg19": None,
           "skipped": []}
    alexnet_pth = lpips_lins_pth = None

    pths = sorted(artifacts_dir.glob("*.pth")) + sorted(artifacts_dir.glob("*.pt"))
    for pth in pths:
        try:
            sd = load_torch_state_dict(str(pth))
            kind = classify_state_dict(sd)
        except Exception as e:
            print(f"  SKIP {pth.name}: unreadable ({e})")
            inv["skipped"].append(pth.name)
            continue
        if kind is None:
            print(f"  SKIP {pth.name}: unrecognized state-dict layout")
            inv["skipped"].append(pth.name)
            continue
        if kind == "alexnet":
            alexnet_pth = pth
            continue
        if kind == "lpips_lins":
            lpips_lins_pth = pth
            continue
        out = work_dir / f"{pth.stem}.fckpt"
        convert_kind = {"rrdbnet": "rrdbnet", "custom": "custom",
                        "transfer": "transfer", "vgg19": "vgg19",
                        "inception": "inception"}[kind]
        try:
            convert_pth(str(pth), str(out), kind=convert_kind)
        except Exception as e:
            # A classifiable-but-malformed artifact (truncated tensors,
            # missing keys) must not abort the whole harness — same
            # SKIP-and-continue contract as unreadable files above.
            print(f"  SKIP {pth.name}: conversion failed ({e})")
            inv["skipped"].append(pth.name)
            continue
        if kind in ("custom", "transfer", "rrdbnet"):
            inv["models"][pth.stem] = out
        elif kind == "vgg19":
            inv["vgg19"] = out
        elif kind == "inception":
            inv["inception"] = out

    if alexnet_pth and lpips_lins_pth:
        out = work_dir / "lpips_alex.fckpt"
        convert_pth(str(alexnet_pth), str(out), kind="lpips",
                    extra_pth=str(lpips_lins_pth))
        inv["lpips"] = out
    elif alexnet_pth or lpips_lins_pth:
        have = "alexnet backbone" if alexnet_pth else "lpips lin heads"
        print(f"  WARNING: found only the {have} — LPIPS needs both the "
              f"torchvision alexnet .pth and the lpips-pkg alex.pth lin "
              f"heads; the LPIPS column will be unavailable")

    # Pre-converted facesr model checkpoints pass straight through
    for fck in sorted(artifacts_dir.glob("*.fckpt")):
        inv["models"].setdefault(fck.stem, fck)
    return inv


# ---------------------------------------------------------------------------
# Evaluation (reference compare_two_models.py metric conventions)
# ---------------------------------------------------------------------------

def evaluate_methods(inv, test_dir: Path, num_images: int, scale: int,
                     int8: bool, calibrate: int, max_batch: int | None):
    """Measured metrics per method. Returns (rows, int8_rows, fid_note)
    where rows = {name: {psnr, ssim[, lpips][, fid]}} and int8_rows =
    {name: {agreement_psnr, delta_psnr, ...}} (int8 vs the model's own
    f32 forward)."""
    import cv2
    import jax.numpy as jnp

    from facesr.evaluation import peak_signal_noise_ratio, structural_similarity
    from facesr.evaluation.batched import (
        make_predictor, sr_batched, synthesize_lr_batched)
    from facesr.evaluation.metrics import LPIPS
    from facesr.data.dataset import _list_images
    from facesr.models.load import load_any_model

    files = (_list_images(test_dir) if test_dir.is_dir() else [])[:num_images]
    if not files:
        raise SystemExit(f"No test images in {test_dir}")
    print(f"\nEvaluating on {len(files)} images from {test_dir}")

    hrs = []
    for f in files:
        bgr = cv2.imread(str(f), cv2.IMREAD_COLOR)
        if bgr is None:
            print(f"  skipping unreadable image {f.name}")
            continue
        h = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        # center-crop to a scale multiple (same rule as the compare CLI)
        oy, ox = (h.shape[0] % scale) // 2, (h.shape[1] % scale) // 2
        hrs.append(h[oy:oy + h.shape[0] // scale * scale,
                     ox:ox + h.shape[1] // scale * scale])
    if not hrs:
        raise SystemExit(f"No readable test images in {test_dir} "
                         f"({len(files)} files, all failed to decode)")
    lrs = synthesize_lr_batched(hrs, scale)
    lrs_u8 = [(np.clip(l, 0, 1) * 255).round().astype(np.uint8) for l in lrs]

    lpips_fn = LPIPS(verbose=True)

    def metrics_of(sr_u8_list):
        ps, ss, lp = [], [], []
        for sr, hr in zip(sr_u8_list, hrs):
            ps.append(peak_signal_noise_ratio(hr, sr, data_range=255))
            ss.append(structural_similarity(hr, sr, data_range=255,
                                            channel_axis=-1))
            if lpips_fn.available:
                a = jnp.asarray(sr[None].astype(np.float32) / 255.0)
                b = jnp.asarray(hr[None].astype(np.float32) / 255.0)
                lp.append(float(lpips_fn(a, b)))
        out = {"psnr": float(np.mean(ps)), "ssim": float(np.mean(ss))}
        if lp:
            out["lpips"] = float(np.mean(lp))
        return out

    import cv2 as _cv2

    baselines = {"Bilinear": _cv2.INTER_LINEAR, "Bicubic": _cv2.INTER_CUBIC,
                 "Lanczos4": _cv2.INTER_LANCZOS4}
    rows, sr_sets = {}, {}
    for name, interp in baselines.items():
        srs = [cv2.resize(lr, (hr.shape[1], hr.shape[0]), interpolation=interp)
               for lr, hr in zip(lrs_u8, hrs)]
        rows[name] = metrics_of(srs)
        sr_sets[name] = srs
        print(f"  {name}: {rows[name]}")

    int8_rows = {}
    for stem, path in inv["models"].items():
        try:
            model = load_any_model(str(path))
        except Exception as e:
            # A pass-through .fckpt that isn't an SR model (e.g. a
            # vgg19/lpips conversion artifact dropped into --artifacts)
            # gets the same SKIP-and-continue treatment as malformed .pth.
            print(f"  SKIP {Path(path).name}: not a loadable SR model ({e})")
            inv["skipped"].append(Path(path).name)
            continue
        pred = make_predictor(model, max_batch=max_batch, dtype=None)
        # sr_batched already returns uint8 [0,255] images in input order.
        srs = sr_batched(model, lrs, predictor=pred)
        rows[stem] = metrics_of(srs)
        sr_sets[stem] = srs
        print(f"  {stem}: {rows[stem]}")

        if int8:
            calib = np.stack([l for l in lrs[:max(calibrate, 1)]
                              if l.shape == lrs[0].shape])
            pred8 = make_predictor(model, max_batch=max_batch,
                                   dtype="int8_full", calibration=calib)
            srs8 = sr_batched(model, lrs, predictor=pred8)
            agree = float(np.mean([
                peak_signal_noise_ratio(a, b, data_range=255)
                for a, b in zip(srs, srs8)]))
            m8 = metrics_of(srs8)
            int8_rows[stem] = {
                "agreement_psnr": agree,
                "delta_psnr": m8["psnr"] - rows[stem]["psnr"],
                "delta_ssim": m8["ssim"] - rows[stem]["ssim"],
                **{f"int8_{k}": v for k, v in m8.items()},
            }
            print(f"  {stem} [int8_full calibrated]: agreement "
                  f"{agree:.2f} dB, dPSNR {int8_rows[stem]['delta_psnr']:+.3f}")

    # FID (no published targets — reported as INFO rows)
    fid_note = None
    from facesr.models.inception import load_inception_weights

    weights = None
    try:
        # Returns None when weights are absent; raises only on structurally
        # broken weight files — report those as a note, not a crash.
        weights = load_inception_weights()
    except Exception as e:
        fid_note = f"FID backend weights unloadable: {e}"
    if weights is not None:
        from facesr.evaluation.fid import inception_activations, fid_from_activations

        try:
            act_hr = inception_activations(hrs, weights)
            for name, srs in sr_sets.items():
                rows[name]["fid"] = fid_from_activations(
                    act_hr, inception_activations(srs, weights))
                print(f"  FID {name}: {rows[name]['fid']:.3f}")
        except Exception as e:  # tiny eval sets can be numerically degenerate
            fid_note = f"FID computation failed: {e}"
            print(f"  {fid_note}")
    else:
        fid_note = fid_note or ("FID backend unavailable (no InceptionV3 "
                                "weights in the artifacts)")
    return rows, int8_rows, fid_note


# ---------------------------------------------------------------------------
# Target matching / verdicts
# ---------------------------------------------------------------------------

def match_target(name: str, targets: dict):
    """Exact row name first, then fuzzy stem matching for model rows."""
    if name in targets:
        return name
    low = name.lower()
    for key in targets:
        if key in ("Bilinear", "Bicubic", "Lanczos4"):
            continue
        if key.lower() in low:
            return key
    return None


def build_report(rows, targets, tols, int8_rows, int8_max_drop,
                 model_names=()):
    report, any_fail = [], False
    for name, measured in rows.items():
        tkey = match_target(name, targets)
        if tkey is None and name in model_names:
            # An SR model row that matched no target would otherwise become
            # all-INFO and the harness would print PASS without having
            # validated the one thing it exists to validate. Fail loudly:
            # the fix is --targets (or --emit-targets to record this model
            # as its own target) or naming the checkpoint after its row.
            print(f"  ERROR: model '{name}' matched no target row "
                  f"({sorted(targets)}); use --targets or --emit-targets")
            report.append({"row": name, "metric": "target-match",
                           "measured": float("nan"),
                           "status": "NO_TARGET"})
            any_fail = True
        for metric in ("psnr", "ssim", "lpips", "fid"):
            if metric not in measured:
                continue
            entry = {"row": name, "metric": metric,
                     "measured": measured[metric]}
            target = (targets.get(tkey) or {}).get(metric) if tkey else None
            if target is None or metric not in tols:
                entry["status"] = "INFO"
            else:
                delta = measured[metric] - target
                ok = abs(delta) <= tols[metric]
                entry.update(target=target, delta=delta,
                             tolerance=tols[metric],
                             matched_target_row=tkey,
                             status="PASS" if ok else "FAIL")
                any_fail |= not ok
            report.append(entry)
    for name, vals in int8_rows.items():
        ok = vals["delta_psnr"] >= -int8_max_drop
        report.append({"row": f"{name} [int8]", "metric": "delta_psnr",
                       "measured": vals["delta_psnr"],
                       "target": -int8_max_drop, "tolerance": int8_max_drop,
                       "status": "PASS" if ok else "FAIL", **vals})
        any_fail |= not ok
    return report, any_fail


def print_table(report):
    print(f"\n{'Row':<28} {'Metric':<10} {'Measured':>10} {'Target':>10} "
          f"{'Delta':>9}  Status")
    print("-" * 80)
    for e in report:
        tgt = f"{e['target']:.4f}" if "target" in e and e["target"] is not None else "—"
        dlt = f"{e['delta']:+.4f}" if "delta" in e else "—"
        print(f"{e['row']:<28} {e['metric']:<10} {e['measured']:>10.4f} "
              f"{tgt:>10} {dlt:>9}  {e['status']}")


def main():
    p = argparse.ArgumentParser(
        description="Validate metric parity of converted reference artifacts "
                    "against the BASELINE tolerances")
    p.add_argument("--artifacts", required=True,
                   help="directory of reference .pth artifacts (and/or "
                        "pre-converted .fckpt model checkpoints)")
    p.add_argument("--test-dir", required=True,
                   help="directory of HR test images (FFHQ test split)")
    p.add_argument("--output", default="outputs/parity")
    p.add_argument("--num-images", type=int, default=4970,
                   help="eval-set size (reference README.md:76 used 4,970)")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--targets", default=None,
                   help="JSON file {row: {psnr, ssim, lpips[, fid]}} "
                        "(optionally {'rows': ..., 'tolerances': ...}); "
                        "defaults to the BASELINE.md published table")
    p.add_argument("--emit-targets", default=None, metavar="PATH",
                   help="write measured values as a targets JSON and skip "
                        "pass/fail (self-consistency harness mode)")
    p.add_argument("--int8", action="store_true",
                   help="also measure calibrated int8_full serving deltas "
                        "vs each model's own f32 forward")
    p.add_argument("--calibrate", type=int, default=8,
                   help="number of eval LR images used for int8 calibration")
    p.add_argument("--int8-max-drop", type=float, default=0.5,
                   help="max tolerated int8 PSNR drop vs f32 (dB)")
    p.add_argument("--tolerance-psnr", type=float, default=None)
    p.add_argument("--tolerance-ssim", type=float, default=None)
    p.add_argument("--tolerance-lpips", type=float, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="compiled eval batch size (default: serving default)")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    print(f"Scanning artifacts in {args.artifacts} ...")
    inv = discover_and_convert(Path(args.artifacts), out_dir / "converted")
    print(f"  models: {sorted(inv['models'])}")
    print(f"  lpips weights: {inv['lpips'] or 'absent'}")
    print(f"  inception weights: {inv['inception'] or 'absent'}")
    print("  vgg19 weights: " + str(inv["vgg19"] or "absent (perceptual-loss"
          " training parity untestable, metrics unaffected)"))
    if not inv["models"]:
        print("  WARNING: no SR model checkpoints found — validating "
              "baselines only")

    # Route the metric backends at the converted weights for THIS process.
    if inv["lpips"]:
        os.environ["FACESR_LPIPS_WEIGHTS"] = str(inv["lpips"])
    if inv["inception"]:
        os.environ["FACESR_INCEPTION_WEIGHTS"] = str(inv["inception"])
    if inv["vgg19"]:
        os.environ["FACESR_VGG19_WEIGHTS"] = str(inv["vgg19"])

    rows, int8_rows, fid_note = evaluate_methods(
        inv, Path(args.test_dir), args.num_images, args.scale,
        int8=args.int8, calibrate=args.calibrate, max_batch=args.batch_size)

    if args.emit_targets:
        payload = {"rows": rows, "tolerances": DEFAULT_TOLERANCES}
        with open(args.emit_targets, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"\nWrote measured targets to {args.emit_targets} (no "
              f"pass/fail in --emit-targets mode)")
        return 0

    targets, tols = dict(DEFAULT_TARGETS), dict(DEFAULT_TOLERANCES)
    if args.targets:
        with open(args.targets) as f:
            loaded = json.load(f)
        if "rows" in loaded:
            targets = loaded["rows"]
            tols.update(loaded.get("tolerances", {}))
        else:
            targets = loaded
    for metric in ("psnr", "ssim", "lpips"):
        override = getattr(args, f"tolerance_{metric}")
        if override is not None:
            tols[metric] = override

    report, any_fail = build_report(rows, targets, tols, int8_rows,
                                    args.int8_max_drop,
                                    model_names=set(inv["models"]))
    print_table(report)
    if fid_note:
        print(f"\nNote: {fid_note}")

    result = {"rows": rows, "int8": int8_rows, "report": report,
              "tolerances": tols, "skipped_artifacts": inv["skipped"],
              "verdict": "FAIL" if any_fail else "PASS"}
    with open(out_dir / "parity_report.json", "w") as f:
        json.dump(result, f, indent=2)
    print(f"\nVerdict: {result['verdict']}  "
          f"(report: {out_dir / 'parity_report.json'})")
    return 1 if any_fail else 0


if __name__ == "__main__":
    sys.exit(main())
