#!/usr/bin/env python
"""Training CLI — same interface as the reference `scripts/train.py`.

Usage:
    python scripts/train.py --config configs/stages/stage1_psnr_config.yaml
    python scripts/train.py --model custom --epochs 50

CLI args override YAML which overrides coded defaults (reference
train.py:152-158). Runs sharded data-parallel over all visible TPU chips.
"""

import argparse
import sys
from pathlib import Path

project_root = Path(__file__).parent.parent
sys.path.insert(0, str(project_root))

from facesr.config import load_config, set_seed


def create_model(model_type: str, config: dict):
    """Model factory (reference train.py:57-81)."""
    from facesr.models import (
        create_face_enhance_net,
        create_transfer_model,
        create_esrgan_baseline,
    )

    if model_type == "custom":
        mc = config.get("model", {}).get("custom", {})
        return create_face_enhance_net(
            num_channels=mc.get("num_channels", 64),
            num_groups=mc.get("num_groups", 3),
            blocks_per_group=mc.get("blocks_per_group", 4),
            reduction_ratio=mc.get("reduction_ratio", 4),
            scale_factor=mc.get("upscale_factor", 4),
            res_scale=mc.get("res_scale", 0.2),
        )
    if model_type == "transfer":
        tc = config.get("model", {}).get("transfer", {})
        return create_transfer_model(
            pretrained_path=tc.get("pretrained_path"),
            backbone_blocks=tc.get("backbone_blocks", 16),
            freeze_blocks=tc.get("freeze_blocks", 16),
            head_blocks=tc.get("head_blocks", 4),
            head_channels=tc.get("head_channels", 64),
            scale_factor=tc.get("scale_factor", 4),
        )
    if model_type == "esrgan":
        return create_esrgan_baseline()
    raise ValueError(f"Unknown model type: {model_type}")


def main():
    parser = argparse.ArgumentParser(description="Train Face Super-Resolution Model")
    parser.add_argument("--config", type=str, default="configs/config.yaml")
    parser.add_argument("--model", type=str, default=None,
                        choices=["custom", "transfer", "esrgan"])
    parser.add_argument("--data-root", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--gradient-clip", type=float, default=None)
    parser.add_argument("--perceptual-weight", type=float, default=None)
    parser.add_argument("--patience", type=int, default=None)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--fine-tune", action="store_true",
                        help="Fine-tune mode: load weights only, reset optimizer/scheduler")
    parser.add_argument("--overfit-test", action="store_true")
    parser.add_argument("--no-wandb", action="store_true")
    parser.add_argument("--yes", action="store_true",
                        help="Skip interactive prompts (CI / headless runs)")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force JAX platform (e.g. cpu) — the env's TPU "
                             "plugin ignores JAX_PLATFORMS")
    parser.add_argument("--device", type=str, default=None,
                        help="Reference-compat alias: 'cpu' maps to "
                             "--platform cpu; 'cuda' is ignored (JAX picks "
                             "the accelerator automatically)")
    parser.add_argument("--qat-scales", type=str, default=None,
                        help="calibrated int8 artifact "
                             "(scripts/export_quantized.py output) pinning "
                             "QAT's activation grid to the static serving "
                             "scales (training.qat must be on)")
    parser.add_argument("--mesh-axes", type=str, default=None,
                        help="mesh composition override, e.g. data,space / "
                        "data,model / data,pp (docs/parallelism.md)")
    parser.add_argument("--mesh-shape", type=str, default=None,
                        help="mesh shape for multi-axis meshes, e.g. 4,2")
    parser.add_argument("--print-memory", action="store_true",
                        help="print the train step's per-device HBM budget "
                        "(XLA buffer assignment) before training; shows "
                        "what mesh_axes compositions buy (adds one compile)")
    parser.add_argument("--fast-loader", action="store_true",
                        help="Use the native (C++) HR-only batch assembler "
                             "for the training loader (LR is synthesized "
                             "on-device by the trainer anyway)")
    args = parser.parse_args()

    if args.device and not args.platform:
        if args.device == "cpu":
            args.platform = "cpu"
        else:
            print(f"Note: --device {args.device} ignored; JAX selects the "
                  f"accelerator (use --platform to force one).")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    config = {}
    if Path(args.config).exists():
        config = load_config(args.config)
        print(f"Loaded config from {args.config}")
    elif args.config != "configs/config.yaml":
        # only the coded default may be legitimately absent; an explicit
        # --config typo must not silently train with all defaults
        raise SystemExit(f"Config not found: {args.config}")

    project_config = config.get("project", {})
    data_config = config.get("data", {})
    training_config = config.get("training", {})
    loss_config = config.get("loss", {})
    checkpoint_config = config.get("checkpoint", {})
    logging_config = config.get("logging", {})

    seed = project_config.get("seed", 42)
    set_seed(seed)

    # `is not None`, not `or`: 0 is a legitimate override (e.g. --epochs 0
    # for a dry config check) and must not silently fall back
    batch_size = (args.batch_size if args.batch_size is not None
                  else data_config.get("batch_size", 16))
    epochs = args.epochs if args.epochs is not None else training_config.get("epochs", 50)
    lr = args.lr if args.lr is not None else training_config.get("optimizer", {}).get("lr", 1e-4)
    data_root = args.data_root or data_config.get("data_root", "data/processed")
    model_type = args.model or config.get("model", {}).get("type", "custom")

    import jax

    print(f"\n{'=' * 60}")
    print("Face Super-Resolution Training (TPU-native)")
    print(f"{'=' * 60}")
    print(f"Model: {model_type}")
    print(f"Epochs: {epochs}")
    print(f"Batch size: {batch_size}")
    print(f"Learning rate: {lr}")
    print(f"Devices: {len(jax.devices())}x {jax.devices()[0].platform}")
    print(f"Data root: {data_root}")
    print(f"{'=' * 60}\n")

    from facesr.data import get_dataloader
    from facesr.losses import create_loss_function
    from facesr.models.discriminator import create_discriminator
    from facesr.training import Trainer, TrainerConfig, overfit_test

    print("Creating data loaders...")
    aug_config = config.get("augmentation", {})
    color_jitter = aug_config.get("color_jitter", {})
    hr_patch = aug_config.get("random_crop", {}).get("hr_patch_size", 128)
    if args.fast_loader:
        from facesr.data.dataset import FFHQDataset
        from facesr.data.fast_loader import FastHRLoader
        from facesr.native import native_available

        print(f"Fast loader: native assembler "
              f"{'available' if native_available() else 'MISSING (numpy fallback)'}")
        # FastHRLoader only does crop+flip; warn when the effective config
        # requests augmentations it will silently drop, so both loader paths
        # train on the documented distribution (ADVICE r1).
        dropped = []
        if color_jitter.get("probability", 0.3) > 0:
            dropped.append(f"color_jitter (p={color_jitter.get('probability', 0.3)})")
        if aug_config.get("random_rotate90", 0.0) > 0:
            dropped.append(f"random_rotate90 (p={aug_config.get('random_rotate90', 0.0)})")
        if dropped:
            print(f"WARNING: --fast-loader drops augmentations: {', '.join(dropped)}. "
                  f"Set augmentation.color_jitter.probability: 0 (and rotate90: 0) "
                  f"in the config to silence this, or drop --fast-loader to keep them.")
        train_dataset = FFHQDataset(data_root, mode="train", hr_patch_size=hr_patch)
        train_loader = FastHRLoader(
            train_dataset,
            batch_size=batch_size,
            crop=hr_patch,
            flip_prob=aug_config.get("horizontal_flip", 0.5),
            num_workers=data_config.get("num_workers", 4),
            seed=seed,
        )
    else:
        # fallbacks match PairedTransform's documented defaults so the
        # effective jitter does not depend on which entry path built the
        # loader; printed below so runs whose YAML omits keys are
        # attributable to the exact augmentation they trained with
        eff_aug = dict(
            horizontal_flip=aug_config.get("horizontal_flip", 0.5),
            random_rotate90=aug_config.get("random_rotate90", 0.0),
            color_jitter_prob=color_jitter.get("probability", 0.3),
            brightness=color_jitter.get("brightness", 0.1),
            contrast=color_jitter.get("contrast", 0.1),
            saturation=color_jitter.get("saturation", 0.1),
            hue=color_jitter.get("hue", 0.05),
        )
        print("Effective augmentation: "
              + ", ".join(f"{k}={v}" for k, v in eff_aug.items()))
        train_loader = get_dataloader(
            data_root,
            mode="train",
            batch_size=batch_size,
            num_workers=data_config.get("num_workers", 4),
            hr_patch_size=hr_patch,
            seed=seed,
            **eff_aug,
        )
    val_loader = get_dataloader(
        data_root,
        mode="val",
        batch_size=batch_size,
        num_workers=data_config.get("num_workers", 4),
        seed=seed,
    )
    print(f"Train samples: {len(train_loader.dataset)}")
    print(f"Val samples: {len(val_loader.dataset)}")

    print(f"\nCreating {model_type} model...")
    model = create_model(model_type, config)
    if hasattr(model, "get_model_info"):
        info = model.get_model_info()
        print(f"Model parameters: {info.get('total_params', 'N/A'):,}")

    print("\nCreating loss function...")
    perceptual_weight = (args.perceptual_weight if args.perceptual_weight is not None
                         else loss_config.get("perceptual_weight", 0.01))
    loss_fn = create_loss_function(
        l1_weight=loss_config.get("l1_weight", 1.0),
        perceptual_weight=perceptual_weight,
        ssim_weight=loss_config.get("ssim_weight", 0.1),
        use_charbonnier=loss_config.get("use_charbonnier", False),
        charbonnier_eps=loss_config.get("charbonnier_eps", 1e-3),
        perceptual_layers=loss_config.get("perceptual", {}).get("layers", ["conv3_4", "conv4_4"]),
    )
    print(f"Loss weights: {loss_fn.get_weights()}")

    if args.overfit_test:
        print("\n" + "=" * 60)
        print("Running overfitting test...")
        print("=" * 60)
        results = overfit_test(model, train_loader, loss_fn,
                               num_images=10, num_iterations=1000)
        if not results["converged"]:
            print("\nWarning: Model did not converge on small batch!")
            if not args.yes:
                response = input("Continue with training? [y/N] ")
                if response.lower() != "y":
                    print("Training aborted.")
                    return

    gradient_clip = (args.gradient_clip if args.gradient_clip is not None
                     else training_config.get("gradient_clip", 1.0))
    early_stopping_config = training_config.get("early_stopping", {})
    patience = (args.patience if args.patience is not None
                else early_stopping_config.get("patience", 10))
    scheduler_config = training_config.get("scheduler", {})
    wandb_config = logging_config.get("wandb", {})
    console_config = logging_config.get("console", {})
    use_wandb = not args.no_wandb and wandb_config.get("enabled", False)

    gan_config = loss_config.get("gan", {})
    gan_weight = gan_config.get("weight", 0.0)

    trainer_config = TrainerConfig(
        epochs=epochs,
        learning_rate=lr,
        weight_decay=training_config.get("optimizer", {}).get("weight_decay", 0.0),
        gradient_clip=gradient_clip,
        accumulation_steps=training_config.get("accumulation_steps", 1),
        use_amp=training_config.get("mixed_precision", True),
        vgg_remat=training_config.get("vgg_remat", False),
        qat=training_config.get("qat", False),
        ema_decay=training_config.get("ema_decay", 0.0),
        scheduler_type=scheduler_config.get("type", "cosine"),
        scheduler_T_max=scheduler_config.get("T_max", epochs),
        scheduler_eta_min=scheduler_config.get("eta_min", 1e-7),
        scheduler_step_size=scheduler_config.get("step_size", 10),
        scheduler_gamma=scheduler_config.get("gamma", 0.5),
        early_stopping_patience=patience,
        early_stopping_metric=early_stopping_config.get("metric", "val_psnr"),
        early_stopping_mode=early_stopping_config.get("mode", "max"),
        checkpoint_dir=checkpoint_config.get("save_dir", "checkpoints"),
        save_every=checkpoint_config.get("save_every", 10),
        save_best=checkpoint_config.get("save_best", True),
        log_every=console_config.get("log_every", 100),
        step_log_every=console_config.get("step_log_every", 24),
        log_images_every=wandb_config.get("log_images_every", 5),
        log_gradients_every=logging_config.get("log_gradients_every", 0),
        use_wandb=use_wandb,
        wandb_project=wandb_config.get("project", "face-super-resolution"),
        gan_weight=gan_weight,
        gan_type=gan_config.get("type", "vanilla"),
        d_learning_rate=gan_config.get("d_lr", 1e-4),
        d_weight_decay=gan_config.get("d_weight_decay", 0.0),
        d_updates_per_g=gan_config.get("d_updates_per_g", 1),
        gan_start_epoch=gan_config.get("start_epoch", 0),
        scale_factor=data_config.get("scale_factor", 4),
        # Mesh composition (docs/parallelism.md): CLI > YAML, e.g.
        #   mesh_axes: data,space   mesh_shape: [4, 2]
        mesh_axes=(args.mesh_axes
                   or training_config.get("mesh_axes", "data")),
        mesh_shape=(tuple(int(s) for s in args.mesh_shape.split(","))
                    if args.mesh_shape else
                    tuple(training_config["mesh_shape"])
                    if training_config.get("mesh_shape") else None),
        pp_microbatches=training_config.get("pp_microbatches", 0),
        skip_nonfinite_updates=training_config.get("skip_nonfinite_updates", 0),
    )

    discriminator = None
    if gan_weight > 0:
        print(f"\nGAN Training Configuration:")
        print(f"  GAN weight: {gan_weight}, type: {trainer_config.gan_type}")
        print(f"  D LR: {trainer_config.d_learning_rate}, "
              f"D updates/G: {trainer_config.d_updates_per_g}")
        # D must be sized for the images it will actually see: the training
        # HR crop (the reference sizes it from hr_size, which only works
        # because its configs crop at full hr_size).
        d_input = hr_patch  # the loaders crop to hr_patch (default 128)
        discriminator = create_discriminator(
            input_size=d_input,
            base_channels=gan_config.get("d_channels", 64),
            use_bn=gan_config.get("d_use_bn", True),
        )

    if args.qat_scales and not trainer_config.qat:
        # fail fast before building the trainer / touching checkpoints
        raise SystemExit("--qat-scales requires training.qat: true")

    trainer = Trainer(
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        loss_fn=loss_fn,
        config=trainer_config,
        discriminator=discriminator,
    )

    # CLI --resume is a full resume (unless --fine-tune); a `resume:` path
    # from the stage YAML is stage *chaining* and always loads weights-only —
    # a full resume from a completed prior stage would restore its epoch
    # counter and train zero epochs (the reference sidesteps this by only
    # honoring its CLI flag and leaving the YAML key dead).
    if args.resume and not Path(args.resume).exists():
        # silent fallthrough here trained hours from scratch and
        # overwrote the checkpoint dir on a typo'd path
        raise SystemExit(f"--resume checkpoint not found: {args.resume}")
    if args.resume:
        print(f"\nLoading checkpoint from {args.resume}")
        trainer.load_checkpoint(args.resume, weights_only=args.fine_tune)
    elif checkpoint_config.get("resume"):
        path = checkpoint_config["resume"]
        if not Path(path).exists():
            # same guard as CLI --resume: silently training from scratch
            # on a typo'd chain path wastes hours and overwrites the dir
            raise SystemExit(f"checkpoint.resume not found: {path}")
        print(f"\nChaining from stage checkpoint {path} (weights only)")
        trainer.load_checkpoint(path, weights_only=True)

    if args.qat_scales:
        # after restore, so the provenance check sees the weights training
        # will actually start from; weight-hash mismatch is a note, not an
        # error — QAT's whole point is training AWAY from the calibration
        # source while keeping its static serving grid
        from facesr.parallel.serving import load_calibrated_qparams

        trainer.set_qat_scales(load_calibrated_qparams(
            trainer.state.params, args.qat_scales,
            require_weight_match=False))
        print(f"QAT pinned to calibrated activation scales from {args.qat_scales}")

    if args.print_memory:
        # AFTER any restore and --qat-scales pinning: memory_report traces
        # (and freezes) the step program, so it must describe the program
        # training will actually run — tracing before set_qat_scales both
        # reported the wrong (dynamic-scale) program and made the later
        # pinning raise
        # report on the shape the train loop actually executes: batches
        # are trimmed down (or padded up) to the mesh's batch divisor
        div = trainer._batch_divisor
        eff = batch_size - batch_size % div if batch_size >= div else div
        if eff != batch_size:
            print(f"(--print-memory: reporting on the effective batch "
                  f"{eff}, the train loop's trim/pad of {batch_size})")
        trainer.memory_report(eff, hr_patch)

    print("\n" + "=" * 60)
    print("Starting training...")
    print("=" * 60 + "\n")

    # Preemption safety: TPU pods are routinely preempted with SIGTERM —
    # route it into the same interrupt-checkpoint path the reference only
    # wires to Ctrl-C (reference train.py:387-391). The handler re-raises
    # as KeyboardInterrupt so one code path saves `interrupted.fckpt`.
    import signal

    def _sigterm(_signum, _frame):
        raise KeyboardInterrupt("SIGTERM (preemption)")

    prev_sigterm = signal.signal(signal.SIGTERM, _sigterm)

    try:
        history = trainer.train()
        print("\n" + "=" * 60)
        print("Training complete!")
        print("=" * 60)
        print(f"\nFinal metrics:")
        if history["val_psnr"]:
            print(f"  Best PSNR: {max(history['val_psnr']):.2f} dB")
            print(f"  Best SSIM: {max(history['val_ssim']):.4f}")
    except KeyboardInterrupt as e:
        print(f"\n\nTraining interrupted ({e or 'user'}).")
        print("Saving checkpoint...")
        trainer.save_checkpoint("interrupted.fckpt")
        trainer.flush_checkpoints()  # the process is about to exit
        print(f"Checkpoint saved to {trainer_config.checkpoint_dir}/interrupted.fckpt")
    finally:
        if prev_sigterm is not None:  # None = handler installed by C code
            signal.signal(signal.SIGTERM, prev_sigterm)


if __name__ == "__main__":
    main()
