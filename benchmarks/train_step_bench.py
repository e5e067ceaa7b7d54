"""Stage-1 train-step throughput bench + profiler harness (TPU).

Reproduces the trainer's stage-1 step exactly (production 6x10x64 model,
L1 + VGG19-conv3_4 perceptual, bf16 compute policy, on-device bicubic LR
synthesis — reference hot loop src/training/trainer.py:412-536) and times
it with on-device scalar sync (block_until_ready is unreliable on the
tunneled axon platform).

Usage:
  python benchmarks/train_step_bench.py --batch 96 --remat rcab
  python benchmarks/train_step_bench.py --batch 96 --remat save_convs --profile /tmp/trace
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=96)
    p.add_argument("--remat", default="save_ca",
                   choices=["rcab", "save_ca", "save_convs", "none"])
    p.add_argument("--vgg-remat", default="on", choices=["on", "off"])
    p.add_argument("--ssim-weight", type=float, default=0.0,
                   help="add the SSIM loss term (stage-2 configuration)")
    p.add_argument("--gan", action="store_true",
                   help="stage-3 step: D update + G update + adversarial term")
    p.add_argument("--d-updates", type=int, default=1,
                   help="discriminator updates per G step (0 = ablate the D update)")
    p.add_argument("--gan-weight", type=float, default=0.005,
                   help="0 ablates the D forward inside the G update")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: fake-quant every conv "
                        "on the int8 serving grid (STE)")
    p.add_argument("--qat-static", action="store_true",
                   help="QAT on STATIC activation scales (synthetic values — "
                        "compiled speed is scale-independent): no per-conv "
                        "activation max-reduce in the step")
    p.add_argument("--ema", type=float, default=0.0,
                   help="EMA decay (> 0 maintains the generator average "
                        "inside the step)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--hr-size", type=int, default=256)
    p.add_argument("--f32", action="store_true", help="disable the bf16 policy")
    p.add_argument("--donate", action="store_true", default=True)
    p.add_argument("--profile", default=None, help="jax.profiler trace dir")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp

    from facesr.models import face_enhance_net as fen
    from facesr.losses import combined as fc
    from facesr.training import steps as steps_lib
    from facesr.training.steps import TrainState, make_optimizer, set_learning_rate

    cfg = fen.FaceEnhanceNetConfig(num_groups=6, blocks_per_group=10,
                                   num_channels=64, remat=args.remat)
    params = fen.init(jax.random.PRNGKey(0), cfg)
    loss_fn = fc.CombinedLoss(fc.LossConfig(
        l1_weight=1.0, perceptual_weight=1.0, ssim_weight=args.ssim_weight,
        perceptual_layers=["conv3_4"],
    ))
    vgg_remat = args.vgg_remat == "on"

    tx = make_optimizer(weight_decay=1e-4, gradient_clip=0.5)
    opt_state = set_learning_rate(tx.init(params), 1e-4)

    compute_dtype = None if args.f32 else jnp.bfloat16
    model_apply = lambda p_, x, train, dtype: fen.apply(p_, x, cfg, train=train, dtype=dtype)
    if args.qat or args.qat_static:
        from facesr.ops.quant import (
            attach_act_scales, fake_quant_params, quantize_conv_kernels)

        act_scales = None
        if args.qat_static:
            qp_sid, n_sites = quantize_conv_kernels(params, with_sids=True)
            act_scales = attach_act_scales(qp_sid, np.full(n_sites, 2.0))
        _base_apply = model_apply
        model_apply = lambda p_, x, train, dtype: _base_apply(
            fake_quant_params(p_, act_scales=act_scales), x, train=train, dtype=dtype)
    ema_params = steps_lib.init_ema(params) if args.ema > 0 else None
    loss_apply = lambda lp, p_, t: loss_fn.apply(lp, p_, t, compute_dtype=compute_dtype,
                                                 vgg_remat=vgg_remat)
    if args.gan:
        from facesr.models import discriminator as disc_lib

        dcfg, d_params, d_stats = disc_lib.create_discriminator(
            input_size=args.hr_size)
        tx_d = make_optimizer(weight_decay=0.0, gradient_clip=0.0)
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                           opt_state=opt_state, loss_params=loss_fn.params,
                           d_params=d_params, d_stats=d_stats,
                           d_opt_state=set_learning_rate(tx_d.init(d_params), 1e-4),
                           ema_params=ema_params)
        disc_apply = lambda p_, s, x, train: disc_lib.apply(
            p_, s, x, dcfg, train=train, dtype=compute_dtype)
        step_fn = steps_lib.make_gan_train_step(
            model_apply, loss_apply, disc_apply, tx, tx_d, scale_factor=4,
            gan_weight=args.gan_weight, gan_type="vanilla",
            d_updates_per_g=args.d_updates, compute_dtype=compute_dtype,
            ema_decay=args.ema)
    else:
        state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                           opt_state=opt_state, loss_params=loss_fn.params,
                           ema_params=ema_params)
        step_fn = steps_lib.make_train_step(model_apply, loss_apply, tx,
                                            scale_factor=4, compute_dtype=compute_dtype,
                                            ema_decay=args.ema)
    step = jax.jit(step_fn, donate_argnums=0 if args.donate else ())

    rng = np.random.default_rng(0)
    hr = jnp.asarray(rng.random((args.batch, args.hr_size, args.hr_size, 3),
                                dtype=np.float32))

    t0 = time.perf_counter()
    state, metrics = step(state, hr)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}")
    state, metrics = step(state, hr)
    float(metrics["loss"])

    def timed(n):
        nonlocal state  # state is donated each call; thread it through
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = step(state, hr)
        # on-device scalar fetch gates the whole in-order queue
        _ = float(m["loss"])
        return time.perf_counter() - t0

    if args.profile:
        with jax.profiler.trace(args.profile):
            timed(3)
        print(f"trace written to {args.profile}")

    dts = [timed(args.steps) for _ in range(3)]
    dt = sorted(dts)[1]
    ms = dt / args.steps * 1e3
    rate = args.batch * args.steps / dt
    print(f"batch {args.batch}{' GAN' if args.gan else ''}"
          f"{' QAT' if args.qat else ''}{' QAT-static' if args.qat_static else ''}"
          f"{f' ema={args.ema}' if args.ema else ''} "
          f"remat={args.remat} vgg_remat={args.vgg_remat} "
          f"dtype={'f32' if args.f32 else 'bf16'}: "
          f"{ms:.1f} ms/step, {rate:.1f} img/s/chip "
          f"(reps {[round(args.batch * args.steps / d, 1) for d in dts]})")


if __name__ == "__main__":
    main()
