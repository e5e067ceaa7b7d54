#!/usr/bin/env python
"""Input-pipeline throughput bench: can the host feed the chip?

The stage-1 train step sustains ~349 img/s @128 on a v5e chip (BENCH.md),
and the real FFHQ corpus is ~70k on-disk PNGs (SURVEY §7 hard part 6).
This bench generates a few thousand PNGs once, then measures images/sec
through every host-side path:

  pairs    — FFHQDataset dir backend, HR+LR PNG pairs, full PairedTransform
  hronly   — HR-only dir backend (LR synthesized per sample on the host)
  fast     — FastHRLoader: HR decode + native C++ crop/flip/normalize
             (LR is regenerated ON DEVICE by the trainer, trainer.py)
  hdf5     — uncompressed HDF5 backend (decode-free reads)

Results + the roofline argument live in BENCH.md ("Input pipeline").
All paths are pure host work — no accelerator involved; run anywhere.

Usage:
  python benchmarks/loader_bench.py                       # full (2000 imgs)
  python benchmarks/loader_bench.py --num-images 64 --batch 16   # smoke
"""

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import cv2

sys.path.insert(0, str(Path(__file__).parent.parent))

TRAIN_STEP_TARGET = 349.0  # stage-1 img/s on one v5e chip (BENCH.md)


def generate_corpus(root: Path, n: int, hr_size: int, scale: int) -> None:
    """PNG pairs shaped like prepare_data output (HR 256 + LR 64). Written
    once and keyed by the generation params; reruns reuse the corpus."""
    stamp = root / f"done_{n}_{hr_size}_{scale}"
    if stamp.exists():
        return
    if root.exists():
        shutil.rmtree(root)
    hr_dir, lr_dir = root / "train" / "HR", root / "train" / "LR"
    hr_dir.mkdir(parents=True)
    lr_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    # Smooth noise compresses like a natural image (flat synthetic fills
    # would deflate PNG decode cost and overstate loader throughput).
    for i in range(n):
        img = (rng.random((hr_size, hr_size, 3)) * 255).astype(np.uint8)
        img = cv2.GaussianBlur(img, (15, 15), 4)
        cv2.imwrite(str(hr_dir / f"{i:05d}.png"), img)
        lr = cv2.resize(img, (hr_size // scale, hr_size // scale),
                        interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(lr_dir / f"{i:05d}.png"), lr)
    stamp.touch()


def make_hdf5(root: Path, out: Path) -> bool:
    """Pack the PNG corpus into uncompressed HDF5 (the decode-free backend)."""
    try:
        import h5py
    except ImportError:
        return False
    if out.exists():
        return True
    hr_files = sorted((root / "train" / "HR").glob("*.png"))
    lr_files = sorted((root / "train" / "LR").glob("*.png"))
    with h5py.File(out, "w") as f:
        hr0 = cv2.imread(str(hr_files[0]))
        lr0 = cv2.imread(str(lr_files[0]))
        hr_ds = f.create_dataset("HR", (len(hr_files),) + hr0.shape, np.uint8)
        lr_ds = f.create_dataset("LR", (len(lr_files),) + lr0.shape, np.uint8)
        for i, (h, l) in enumerate(zip(hr_files, lr_files)):
            hr_ds[i] = cv2.cvtColor(cv2.imread(str(h)), cv2.COLOR_BGR2RGB)
            lr_ds[i] = cv2.cvtColor(cv2.imread(str(l)), cv2.COLOR_BGR2RGB)
    return True


def drain(loader, batch_key: str = "hr"):
    """One full epoch; returns (images, total_s, steady_s). Steady-state
    excludes the first batch (thread-pool ramp + prefetch fill)."""
    it = iter(loader)
    t0 = time.perf_counter()
    try:
        first = next(it)
    except StopIteration:
        raise SystemExit(
            "loader yielded zero batches — batch size larger than the "
            "corpus under drop_last; lower --batch or raise --num-images")
    t1 = time.perf_counter()
    n = len(first[batch_key])
    for batch in it:
        n += len(batch[batch_key])
    t2 = time.perf_counter()
    return n, t2 - t0, t2 - t1, n - len(first[batch_key])


def bench_mode(name: str, make_loader, epochs: int = 1):
    from facesr.data import dataset as _ds  # noqa: F401  (import check)

    best = None
    for _ in range(max(epochs, 1)):
        loader = make_loader()
        n, total, steady_t, steady_n = drain(loader)
        total_rate = n / total
        steady_rate = steady_n / steady_t if steady_t > 0 else total_rate
        if best is None or steady_rate > best["steady_img_s"]:
            best = {"mode": name, "images": n,
                    "img_s": round(total_rate, 1),
                    "steady_img_s": round(steady_rate, 1),
                    "vs_train_step": round(steady_rate / TRAIN_STEP_TARGET, 3)}
    print(json.dumps(best))
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--num-images", type=int, default=2000)
    ap.add_argument("--hr-size", type=int, default=256)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--patch", type=int, default=128,
                    help="hr_patch_size for the pair/hronly transforms "
                         "and the fast-loader crop")
    ap.add_argument("--workers", type=int, default=8,
                    help="decode threads (cv2 releases the GIL; on a "
                         "multi-core host scaling is ~linear)")
    ap.add_argument("--corpus", type=str, default="/tmp/facesr_loader_bench")
    ap.add_argument("--modes", type=str, default="pairs,hronly,fast,hdf5")
    ap.add_argument("--epochs", type=int, default=2,
                    help="epochs per mode; best steady-state epoch reported "
                         "(first epoch warms the OS page cache)")
    args = ap.parse_args()

    root = Path(args.corpus)
    print(f"# corpus: {args.num_images} x {args.hr_size}px PNG pairs in {root}",
          file=sys.stderr)
    generate_corpus(root, args.num_images, args.hr_size, args.scale)

    from facesr.data.dataset import FFHQDataset
    from facesr.data.loader import DataLoader
    from facesr.data.fast_loader import FastHRLoader

    modes = args.modes.split(",")
    results = []

    common = dict(mode="train", scale_factor=args.scale,
                  hr_patch_size=args.patch, use_cache=False, seed=0)
    # Pin single-process so host_shard never initializes the JAX runtime —
    # this bench is pure host work.
    proc = dict(process_index=0, process_count=1)

    if "pairs" in modes:
        def make():
            ds = FFHQDataset(str(root), **common)
            return DataLoader(ds, batch_size=args.batch, shuffle=True,
                              drop_last=True, num_workers=args.workers,
                              seed=0, **proc)
        results.append(bench_mode("pairs", make, args.epochs))

    if "hronly" in modes:
        hr_only_root = root / "hronly_view"
        if not hr_only_root.exists():
            (hr_only_root / "train").mkdir(parents=True)
            (hr_only_root / "train" / "HR").symlink_to(root / "train" / "HR")

        def make():
            ds = FFHQDataset(str(hr_only_root), **common)
            return DataLoader(ds, batch_size=args.batch, shuffle=True,
                              drop_last=True, num_workers=args.workers,
                              seed=0, **proc)
        results.append(bench_mode("hronly", make, args.epochs))

    if "fast" in modes:
        def make():
            ds = FFHQDataset(str(root), **common)
            return FastHRLoader(ds, batch_size=args.batch, crop=args.patch,
                                num_workers=args.workers, seed=0, **proc)
        results.append(bench_mode("fast", make, args.epochs))

    if "hdf5" in modes:
        h5_path = root / "train.h5"
        if make_hdf5(root, h5_path):
            def make():
                ds = FFHQDataset(str(h5_path), **common)
                return DataLoader(ds, batch_size=args.batch, shuffle=True,
                                  drop_last=True, num_workers=args.workers,
                                  seed=0, **proc)
            results.append(bench_mode("hdf5", make, args.epochs))
        else:
            print("# h5py unavailable — skipping hdf5 mode", file=sys.stderr)

    import os
    cores = os.cpu_count() or 1
    print(f"\n# host cores: {cores}; chip train-step target: "
          f"{TRAIN_STEP_TARGET} img/s @128 (BENCH.md stage-1)", file=sys.stderr)
    for r in results:
        verdict = "FEEDS the chip" if r["steady_img_s"] >= TRAIN_STEP_TARGET \
            else f"host-bound ({r['vs_train_step']:.2f}x of target)"
        print(f"# {r['mode']:>7}: {r['steady_img_s']:8.1f} img/s steady  -> "
              f"{verdict}", file=sys.stderr)


if __name__ == "__main__":
    main()
