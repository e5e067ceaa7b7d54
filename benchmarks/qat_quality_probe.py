"""QAT quality probe: does quantization-aware fine-tuning recover the int8
serving quality loss?

Protocol (the documented deployment workflow): overfit a small model on a
fixed batch of smooth synthetic images (float), then either (a) keep
training float, or (b) switch to QAT — same total step budget, same init,
same data. Report each arm's float-forward PSNR and int8_full-serving PSNR
against the ground-truth HR, and the quantization degradation (float -
int8). QAT trains THROUGH the serving grid, so its degradation should
collapse toward zero while the float arm keeps whatever the grid costs it.

Usage: python benchmarks/qat_quality_probe.py [--steps 120] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120,
                   help="total steps per arm (float arm: all float; QAT arm: "
                        "half float warmup, half QAT fine-tune)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hr-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--sigma", type=float, default=3.0,
                   help="target smoothness; smaller = sharper = harder task "
                        "with a higher error floor")
    p.add_argument("--channels", type=int, default=16)
    p.add_argument("--groups", type=int, default=2)
    p.add_argument("--blocks", type=int, default=2)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from facesr.models import face_enhance_net as fen
    from facesr.losses import combined as fc
    from facesr.ops import bicubic_down
    from facesr.ops.quant import fake_quant_params, quantize_conv_kernels
    from facesr.training import steps as steps_lib
    from facesr.training.steps import TrainState, make_optimizer, set_learning_rate

    cfg = fen.FaceEnhanceNetConfig(num_channels=args.channels,
                                   num_groups=args.groups,
                                   blocks_per_group=args.blocks)
    rng = np.random.default_rng(0)
    # smooth images: learnable SR signal (pure noise has none)
    hr = np.stack([
        gaussian_filter(rng.random((args.hr_size, args.hr_size, 3)),
                        sigma=args.sigma, axes=(0, 1))
        for _ in range(args.batch)
    ]).astype(np.float32)
    hr -= hr.min()
    hr /= max(hr.max(), 1e-6)
    hr_dev = jnp.asarray(hr)
    lr_dev = jax.jit(lambda h: bicubic_down(h, 4))(hr_dev)

    loss_fn = fc.CombinedLoss(fc.LossConfig(l1_weight=1.0))
    params0 = fen.init(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(weight_decay=0.0, gradient_clip=0.0)

    def make_step(qat: bool):
        apply_ = (
            (lambda p_, x, train, dtype: fen.apply(
                fake_quant_params(p_), x, cfg, train=train, dtype=dtype))
            if qat else
            (lambda p_, x, train, dtype: fen.apply(p_, x, cfg, train=train, dtype=dtype))
        )
        return jax.jit(steps_lib.make_train_step(
            apply_, loss_fn.apply, tx, scale_factor=4, compute_dtype=None))

    def train(n_float: int, n_qat: int):
        state = TrainState(
            step=jnp.asarray(0, jnp.int32), params=params0,
            opt_state=set_learning_rate(tx.init(params0), args.lr),
            loss_params=loss_fn.params)
        step_f, step_q = make_step(False), make_step(True)
        for _ in range(n_float):
            state, m = step_f(state, hr_dev)
        for _ in range(n_qat):
            state, m = step_q(state, hr_dev)
        return jax.device_get(state.params), float(m["loss"])

    def psnr_vs_hr(params, int8: bool):
        p = quantize_conv_kernels(params) if int8 else params
        sr = np.asarray(fen.apply(p, lr_dev, cfg, train=False))
        mse = float(np.mean((sr.astype(np.float64) - hr.astype(np.float64)) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    half = args.steps // 2
    for name, (nf, nq) in (("float-only", (args.steps, 0)),
                           ("float->QAT", (half, args.steps - half))):
        params, last_loss = train(nf, nq)
        f = psnr_vs_hr(params, int8=False)
        q = psnr_vs_hr(params, int8=True)
        print(f"{name:11s}: float {f:6.2f} dB | int8_full {q:6.2f} dB | "
              f"quant degradation {f - q:+.2f} dB (final loss {last_loss:.5f})")


if __name__ == "__main__":
    main()
