#!/usr/bin/env python
"""Per-stage and combined training-history plots — same interface as
reference `scripts/plot_training_stages.py`.

Loads `training_history` from the three stage checkpoints and renders a
2x2 per-stage figure (loss / PSNR / SSIM / LR-or-GAN-losses,
reference :26-144) plus a combined 170-epoch overview with stage boundary
lines (reference :261-316).
"""

import argparse
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load_history(checkpoint_path: str) -> dict:
    from facesr.ckpt import load_checkpoint

    _, meta = load_checkpoint(checkpoint_path)
    hist = meta.get("training_history")
    if not hist:
        raise ValueError(f"No training_history in {checkpoint_path}")
    return hist


def plot_stage(history: dict, stage_name: str, save_path: Path) -> None:
    """2x2 panel: loss / PSNR / SSIM / LR (GAN losses if present)."""
    fig, axes = plt.subplots(2, 2, figsize=(13, 9))

    ax = axes[0, 0]
    ax.plot(history.get("train_loss", []), label="train")
    ax.plot(history.get("val_loss", []), label="val")
    ax.set_title("Loss")
    ax.set_xlabel("epoch")
    ax.legend()
    ax.grid(alpha=0.3)

    ax = axes[0, 1]
    ax.plot(history.get("val_psnr", []), color="tab:green")
    ax.set_title("Validation PSNR (dB)")
    ax.set_xlabel("epoch")
    ax.grid(alpha=0.3)

    ax = axes[1, 0]
    ax.plot(history.get("val_ssim", []), color="tab:orange")
    ax.set_title("Validation SSIM")
    ax.set_xlabel("epoch")
    ax.grid(alpha=0.3)

    ax = axes[1, 1]
    if history.get("d_loss"):
        ax.plot(history["d_loss"], label="D loss")
        if history.get("g_loss"):
            ax.plot(history["g_loss"], label="G adv loss")
        # discriminator outputs on real/fake: healthy GAN training keeps
        # these separated but not saturated (D neither collapsed nor won)
        if history.get("d_real"):
            ax.plot(history["d_real"], label="D(real)", linestyle="--", alpha=0.7)
        if history.get("d_fake"):
            ax.plot(history["d_fake"], label="D(fake)", linestyle="--", alpha=0.7)
        ax.set_title("GAN losses")
        ax.legend()
    else:
        ax.plot(history.get("learning_rate", []), color="tab:red")
        ax.set_yscale("log")
        ax.set_title("Learning rate")
    ax.set_xlabel("epoch")
    ax.grid(alpha=0.3)

    fig.suptitle(f"Training — {stage_name}")
    fig.tight_layout()
    save_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved {save_path}")


def plot_combined(histories: list, names: list, save_path: Path) -> None:
    """Concatenated overview across stages with boundary lines."""
    keys = ["train_loss", "val_loss", "val_psnr", "val_ssim"]
    combined = {k: [] for k in keys}
    boundaries = []
    for h in histories:
        for k in keys:
            combined[k].extend(h.get(k, []))
        boundaries.append(len(combined["val_psnr"]))
    boundaries = boundaries[:-1]

    fig, axes = plt.subplots(1, 3, figsize=(18, 5))
    panels = [
        ("Loss", [("train_loss", "train"), ("val_loss", "val")], None),
        ("Validation PSNR (dB)", [("val_psnr", "PSNR")], "tab:green"),
        ("Validation SSIM", [("val_ssim", "SSIM")], "tab:orange"),
    ]
    for ax, (title, series, color) in zip(axes, panels):
        for key, label in series:
            ax.plot(combined[key], label=label, color=color)
        for j, b in enumerate(boundaries):
            ax.axvline(b, color="gray", linestyle="--", alpha=0.7)
            ax.text(b, ax.get_ylim()[1], f" {names[j + 1]}", fontsize=8,
                    va="top", color="gray")
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.legend()
        ax.grid(alpha=0.3)
    fig.suptitle("Training across all stages")
    fig.tight_layout()
    save_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"Saved {save_path}")


def main():
    parser = argparse.ArgumentParser(description="Plot training stage histories")
    parser.add_argument("--checkpoints", type=str, nargs="+",
                        default=["checkpoints/stage1_final.fckpt",
                                 "checkpoints/stage2_final.fckpt",
                                 "checkpoints/stage3_final.fckpt"])
    parser.add_argument("--names", type=str, nargs="+",
                        default=["Stage 1 (PSNR)", "Stage 2 (SSIM)", "Stage 3 (GAN)"])
    parser.add_argument("--output", "--output-dir", dest="output", type=str,
                        default="outputs/training_plots")
    # reference spelling: one flag per stage checkpoint
    parser.add_argument("--stage1", type=str, default=None)
    parser.add_argument("--stage2", type=str, default=None)
    parser.add_argument("--stage3", type=str, default=None)
    args = parser.parse_args()

    stage_flags = [args.stage1, args.stage2, args.stage3]
    if any(stage_flags):
        args.checkpoints = [p for p in stage_flags if p]
        args.names = [f"Stage {i + 1}" for i, p in enumerate(stage_flags) if p]

    # zip would silently truncate a checkpoint/name length mismatch —
    # extend the default labels instead of dropping checkpoints
    if len(args.names) < len(args.checkpoints):
        args.names = args.names + [
            f"Stage {i + 1}"
            for i in range(len(args.names), len(args.checkpoints))]
    elif len(args.names) > len(args.checkpoints):
        args.names = args.names[:len(args.checkpoints)]

    out = Path(args.output)
    histories, names = [], []
    for ckpt, name in zip(args.checkpoints, args.names):
        if not Path(ckpt).exists():
            print(f"Skipping missing checkpoint {ckpt}")
            continue
        h = load_history(ckpt)
        histories.append(h)
        names.append(name)
        # Stage checkpoints often share a stem (final_model.fckpt per stage
        # dir); prefix with the stage name so per-stage plots don't collide.
        slug = name.lower().replace(" ", "_").replace("(", "").replace(")", "")
        plot_stage(h, name, out / f"{slug}_{Path(ckpt).stem}_curves.png")

    if len(histories) > 1:
        plot_combined(histories, names, out / "combined_overview.png")
    elif not histories:
        print("No checkpoints found to plot.")


if __name__ == "__main__":
    main()
