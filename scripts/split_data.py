#!/usr/bin/env python
"""Split raw files into train/val/test directories — same interface as
reference `scripts/split_data.py:16-124`: ratio normalization, seed 42,
copy or move."""

import argparse
import random
import shutil
from collections import Counter
from pathlib import Path


def split_data(
    input_dir: str,
    output_dir: str,
    train_ratio: float = 0.857,
    val_ratio: float = 0.071,
    test_ratio: float = 0.072,
    seed: int = 42,
    move: bool = False,
) -> dict:
    """Copy/move files into output_dir/{train,val,test}. Ratios are
    normalized to sum to 1 (reference split_data.py:16-124)."""
    input_path = Path(input_dir)
    output_path = Path(output_dir)

    total = train_ratio + val_ratio + test_ratio
    train_ratio, val_ratio, test_ratio = (
        train_ratio / total, val_ratio / total, test_ratio / total)

    extensions = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}
    files = sorted(
        f for f in input_path.rglob("*") if f.suffix.lower() in extensions
    )
    if not files:
        raise ValueError(f"No images found in {input_dir}")
    # destinations are flat dest/<basename>: recursive discovery with
    # colliding basenames would silently overwrite (and with move=True,
    # destroy) files — refuse up front
    dupes = [n for n, c in Counter(f.name for f in files).items() if c > 1]
    if dupes:
        raise ValueError(
            f"{len(dupes)} duplicate basenames across subdirectories "
            f"(e.g. {dupes[:3]}); splits write flat <split>/<name> — "
            f"rename or flatten the input first")
    print(f"Found {len(files)} images")

    random.seed(seed)
    files = list(files)
    random.shuffle(files)

    n = len(files)
    n_train = int(n * train_ratio)
    n_val = int(n * val_ratio)
    splits = {
        "train": files[:n_train],
        "val": files[n_train:n_train + n_val],
        "test": files[n_train + n_val:],
    }

    op = shutil.move if move else shutil.copy2
    counts = {}
    for split, flist in splits.items():
        dest = output_path / split
        dest.mkdir(parents=True, exist_ok=True)
        for f in flist:
            op(str(f), str(dest / f.name))
        counts[split] = len(flist)
        print(f"{split}: {len(flist)} files -> {dest}")
    return counts


def main():
    parser = argparse.ArgumentParser(description="Split dataset into train/val/test")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--train-ratio", type=float, default=0.857)
    parser.add_argument("--val-ratio", type=float, default=0.071)
    parser.add_argument("--test-ratio", type=float, default=0.072)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--move", action="store_true", help="Move instead of copy")
    args = parser.parse_args()

    split_data(args.input, args.output, args.train_ratio, args.val_ratio,
               args.test_ratio, args.seed, args.move)


if __name__ == "__main__":
    main()
