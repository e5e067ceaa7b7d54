"""Offline data preparation: FFHQ raw images -> HR/LR pairs (+ optional HDF5).

Same CLI surface and behavior as reference `src/data/prepare_data.py`:
  python -m facesr.data.prepare_data --input raw/ --output processed/
Degradations: 'bicubic' (cv2.INTER_CUBIC), 'bilinear', 'realistic'
(7x7 gaussian blur sigma 1.5 + N(0,5) noise + bicubic downsample) —
reference prepare_data.py:23-59; HR resize uses INTER_AREA (:62-74);
split ratios 0.857/0.071 seeded shuffle (:96-122); HDF5 output stores gzip'd
uint8 HR/LR stacks + filenames + attrs (:191-248).

This is host-side tooling (runs once, offline) — cv2/numpy is the right
tool here, not the TPU.
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path
from typing import List, Tuple

import numpy as np
import cv2

try:
    import h5py

    H5PY_AVAILABLE = True
except ImportError:
    H5PY_AVAILABLE = False

__all__ = [
    "create_lr_image",
    "resize_hr_image",
    "get_image_files",
    "split_dataset",
    "process_and_save_images",
    "save_to_hdf5",
]


def create_lr_image(hr_image: np.ndarray, lr_size: int = 64, method: str = "bicubic") -> np.ndarray:
    """Downsample an HR image with the chosen degradation."""
    if method == "bicubic":
        return cv2.resize(hr_image, (lr_size, lr_size), interpolation=cv2.INTER_CUBIC)
    if method == "bilinear":
        return cv2.resize(hr_image, (lr_size, lr_size), interpolation=cv2.INTER_LINEAR)
    if method == "realistic":
        blurred = cv2.GaussianBlur(hr_image, (7, 7), 1.5)
        noise = np.random.normal(0, 5, blurred.shape).astype(np.float32)
        noisy = np.clip(blurred.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        return cv2.resize(noisy, (lr_size, lr_size), interpolation=cv2.INTER_CUBIC)
    raise ValueError(f"Unknown degradation method: {method}")


def resize_hr_image(image: np.ndarray, hr_size: int = 256) -> np.ndarray:
    """High-quality downsample of the raw image to HR size (INTER_AREA)."""
    return cv2.resize(image, (hr_size, hr_size), interpolation=cv2.INTER_AREA)


def get_image_files(input_dir: Path) -> List[Path]:
    extensions = {".jpg", ".jpeg", ".png", ".bmp", ".tiff"}
    files: List[Path] = []
    for ext in extensions:
        files.extend(input_dir.glob(f"**/*{ext}"))
        files.extend(input_dir.glob(f"**/*{ext.upper()}"))
    return sorted(set(files))


def split_dataset(
    files: List[Path],
    train_ratio: float = 0.857,
    val_ratio: float = 0.071,
    seed: int = 42,
) -> Tuple[List[Path], List[Path], List[Path]]:
    """Seeded shuffle split (~60k/5k/5k of FFHQ's 70k)."""
    files = list(files)
    # local generator: reseeding the process-global `random` as a side
    # effect would silently reset every other caller's stream
    random.Random(seed).shuffle(files)
    n_total = len(files)
    n_train = int(n_total * train_ratio)
    n_val = int(n_total * val_ratio)
    return files[:n_train], files[n_train:n_train + n_val], files[n_train + n_val:]


def process_and_save_images(
    files: List[Path],
    output_dir: Path,
    hr_size: int = 256,
    lr_size: int = 64,
    degradation: str = "bicubic",
    desc: str = "Processing",
) -> int:
    """Write HR/ and LR/ PNGs for each input image; returns count written.

    This run OWNS the split's HR/ and LR/ dirs: stale files from a previous
    run (different --max-images/--seed) are removed first, or they would be
    silently packed into the new split/HDF5 — train/test leakage."""
    import shutil

    hr_dir = output_dir / "HR"
    lr_dir = output_dir / "LR"
    for d in (hr_dir, lr_dir):
        if d.exists() and any(d.iterdir()):
            print(f"Clearing stale files in {d} from a previous run")
            shutil.rmtree(d)
    hr_dir.mkdir(parents=True, exist_ok=True)
    lr_dir.mkdir(parents=True, exist_ok=True)

    count = 0
    for i, path in enumerate(files):
        img = cv2.imread(str(path))
        if img is None:
            print(f"Warning: could not read {path}")
            continue
        hr = resize_hr_image(img, hr_size)
        lr = create_lr_image(hr, lr_size, degradation)
        name = f"{path.stem}.png"
        cv2.imwrite(str(hr_dir / name), hr)
        cv2.imwrite(str(lr_dir / name), lr)
        count += 1
        if (i + 1) % 500 == 0:
            print(f"{desc}: {i + 1}/{len(files)}")
    return count


def save_to_hdf5(
    split_dir: Path,
    output_path: Path,
    hr_size: int = 256,
    lr_size: int = 64,
) -> None:
    """Pack a processed split dir (HR/ + LR/ PNGs) into one gzip'd HDF5."""
    if not H5PY_AVAILABLE:
        raise RuntimeError("h5py is required for HDF5 output")
    hr_files = sorted((split_dir / "HR").glob("*.png"))
    n = len(hr_files)
    with h5py.File(output_path, "w") as f:
        hr_ds = f.create_dataset(
            "HR", (n, hr_size, hr_size, 3), dtype="uint8",
            compression="gzip", chunks=(1, hr_size, hr_size, 3),
        )
        lr_ds = f.create_dataset(
            "LR", (n, lr_size, lr_size, 3), dtype="uint8",
            compression="gzip", chunks=(1, lr_size, lr_size, 3),
        )
        names = []
        for i, hr_path in enumerate(hr_files):
            lr_path = split_dir / "LR" / hr_path.name
            hr_bgr = cv2.imread(str(hr_path))
            lr_bgr = cv2.imread(str(lr_path))
            if hr_bgr is None or lr_bgr is None:
                raise IOError(f"Unreadable/missing pair for {hr_path.name} "
                              f"(LR exists: {lr_path.exists()})")
            hr = cv2.cvtColor(hr_bgr, cv2.COLOR_BGR2RGB)
            lr = cv2.cvtColor(lr_bgr, cv2.COLOR_BGR2RGB)
            if (hr.shape[:2] != (hr_size, hr_size)
                    or lr.shape[:2] != (lr_size, lr_size)):
                raise ValueError(
                    f"{hr_path.name}: sizes {hr.shape[:2]}/{lr.shape[:2]} do "
                    f"not match hr_size={hr_size}/lr_size={lr_size} — stale "
                    f"files from a previous run with different sizes?")
            hr_ds[i] = hr
            lr_ds[i] = lr
            names.append(hr_path.name)
        f.create_dataset("filenames", data=np.array(names, dtype="S"))
        f.attrs["hr_size"] = hr_size
        f.attrs["lr_size"] = lr_size
        f.attrs["num_images"] = n
    print(f"Saved {n} pairs to {output_path}")


def main() -> None:
    parser = argparse.ArgumentParser(description="Prepare FFHQ SR data")
    parser.add_argument("--input", type=str, required=True, help="Raw image dir")
    parser.add_argument("--output", type=str, required=True, help="Output dir")
    parser.add_argument("--hr-size", type=int, default=256)
    parser.add_argument("--lr-size", type=int, default=64)
    parser.add_argument("--degradation", type=str, default="bicubic",
                        choices=["bicubic", "bilinear", "realistic"])
    parser.add_argument("--train-ratio", type=float, default=0.857)
    parser.add_argument("--val-ratio", type=float, default=0.071)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--hdf5", "--save-hdf5", dest="hdf5", action="store_true",
                        help="Also pack splits into .h5 files")
    parser.add_argument("--max-images", type=int, default=None)
    parser.add_argument("--dry-run", action="store_true",
                        help="Show the split without processing "
                             "(reference prepare_data.py:276,313-315)")
    args = parser.parse_args()

    files = get_image_files(Path(args.input))
    if args.max_images:
        files = files[: args.max_images]
    from collections import Counter

    dupes = [st for st, c in Counter(f.stem for f in files).items() if c > 1]
    if dupes:
        # outputs are flat HR/<stem>.png — recursive discovery with
        # colliding stems would silently overwrite pairs
        raise SystemExit(
            f"{len(dupes)} duplicate stems across subdirectories "
            f"(e.g. {dupes[:3]}); rename or flatten the input first")
    print(f"Found {len(files)} images")

    train_f, val_f, test_f = split_dataset(files, args.train_ratio, args.val_ratio, args.seed)
    if args.dry_run:
        print(f"  Train: {len(train_f)} images")
        print(f"  Val:   {len(val_f)} images")
        print(f"  Test:  {len(test_f)} images")
        print("\n[Dry run] No files were processed.")
        return
    out = Path(args.output)
    stats = {}
    for split, flist in (("train", train_f), ("val", val_f), ("test", test_f)):
        n = process_and_save_images(
            flist, out / split, args.hr_size, args.lr_size, args.degradation, desc=split
        )
        stats[split] = n
        if args.hdf5:
            save_to_hdf5(out / split, out / f"{split}.h5", args.hr_size, args.lr_size)

    (out / "prepare_stats.json").write_text(json.dumps({
        "stats": stats,
        "hr_size": args.hr_size,
        "lr_size": args.lr_size,
        "degradation": args.degradation,
        "seed": args.seed,
    }, indent=2))
    print(f"Done: {stats}")


if __name__ == "__main__":
    main()
