"""Jitted train / eval step builders.

The reference's per-batch hot loop (`src/training/trainer.py:412-536`:
host->device copy, on-the-fly bicubic LR, D loop, G update, metrics) becomes
ONE compiled XLA program per step here:

  - LR synthesis (`F.interpolate(hr, 0.25, bicubic)`, trainer.py:415-421)
    runs on-device inside the step, as two tiny matmuls.
  - The GAN alternation (d_updates_per_g D steps, then a G step with the
    adversarial term, trainer.py:423-505) is unrolled inside the same jit;
    `.detach()`/`no_grad` boundaries become `stop_gradient`.
  - bf16 mixed precision is a compute-dtype policy (no GradScaler: bf16 on
    TPU keeps the fp32 exponent range, so the reference's AMP loss-scaling
    machinery is unnecessary by design).
  - Data parallelism comes from sharding the HR batch over the mesh's
    `data` axis; XLA inserts the gradient all-reduces over ICI.

Steps are pure: (state, hr_batch) -> (state, metrics).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from facesr.ops import bicubic_down
from facesr.losses.gan import gan_loss

__all__ = ["TrainState", "make_train_step", "make_gan_train_step",
           "make_eval_step", "set_learning_rate", "init_ema"]


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    loss_params: Any  # frozen (e.g. VGG) — never updated
    d_params: Any = None
    d_stats: Any = None
    d_opt_state: Any = None
    # Exponential moving average of `params` (generator only). The standard
    # SR-GAN serving trick (RealESRGAN ships `params_ema` — our converter
    # already reads that container); the reference trainer itself has no
    # EMA, so this is a TPU-framework extra, off unless ema_decay > 0.
    ema_params: Any = None


def _ema_update(ema: Any, params: Any, decay: float) -> Any:
    """ema <- decay * ema + (1 - decay) * params, in the EMA's dtype."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )


def init_ema(params: Any) -> Any:
    """Fresh EMA tree seeded from `params` — COPIES every leaf (jnp.array,
    not asarray): the jitted step donates the whole TrainState, and an EMA
    aliasing the params buffers would be donated twice (an error)."""
    return jax.tree.map(lambda x: jnp.array(x), params)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Replace the injected learning_rate hyperparameter anywhere in an
    optax state tree (epoch-granular scheduling without recompilation)."""
    def visit(node):
        if hasattr(node, "hyperparams") and isinstance(node.hyperparams, dict) \
                and "learning_rate" in node.hyperparams:
            hp = dict(node.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            node = node._replace(hyperparams=hp)
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*[visit(f) for f in node])
        if isinstance(node, tuple):
            return tuple(visit(f) for f in node)
        if isinstance(node, list):
            return [visit(f) for f in node]
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    return visit(opt_state)


def make_optimizer(
    weight_decay: float = 1e-4,
    gradient_clip: float = 1.0,
    accumulation_steps: int = 1,
    b1: float = 0.9,
    b2: float = 0.999,
    param_labels: Any = None,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping and optional accumulation, LR injected
    as a runtime hyperparameter (reference optimizer: trainer.py:217-221).

    `param_labels`: optional pytree of 'frozen'/'train' labels (transfer
    model's progressive unfreezing); frozen leaves get zero updates, the
    torch-equivalent of requires_grad=False params sitting in the optimizer.

    `skip_nonfinite` > 0: wrap in optax.apply_if_finite — a step whose
    gradients contain inf/NaN leaves params AND optimizer moments untouched
    (the reference's AMP GradScaler skips stepping on overflow,
    trainer.py:482-505; bf16 on TPU keeps the f32 exponent range so this
    is rarer, but GAN losses can still produce NaNs). The value is the
    number of CONSECUTIVE bad steps tolerated before the guard gives up
    and lets the NaNs poison the params (so a persistently broken run
    still fails loudly instead of silently never updating).
    """
    parts = []
    if gradient_clip and gradient_clip > 0:
        parts.append(optax.clip_by_global_norm(gradient_clip))
    parts.append(
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=jnp.asarray(0.0, jnp.float32),
            b1=b1,
            b2=b2,
            weight_decay=weight_decay,
        )
    )
    tx = optax.chain(*parts)
    if param_labels is not None:
        tx = optax.multi_transform(
            {"frozen": optax.set_to_zero(), "train": tx}, param_labels
        )
    if accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulation_steps)
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx


def _grad_norm_tree(grads: Any) -> Any:
    """Per-leaf L2 norms, computed on-device (tiny reductions — fetching
    these scalars costs ~nothing vs shipping the 20MB grad pytree to host;
    the W&B-facing equivalent of reference wandb.watch gradients,
    trainer.py:324)."""
    return jax.tree.map(
        lambda g: jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32)))), grads
    )


def make_train_step(
    model_apply: Callable,
    loss_apply: Callable,
    tx: optax.GradientTransformation,
    scale_factor: int = 4,
    compute_dtype=None,
    grad_norms: bool = False,
    ema_decay: float = 0.0,
) -> Callable:
    """Content-only (no GAN) train step: LR synth -> G fwd -> loss -> update."""

    def train_step(state: TrainState, hr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        hr = hr.astype(jnp.float32)
        lr_img = bicubic_down(hr, scale_factor)

        def loss_fn(params):
            sr = model_apply(params, lr_img, train=True, dtype=compute_dtype)
            total, comps = loss_apply(state.loss_params, sr, hr)
            return total, comps

        (loss, comps), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = (_ema_update(state.ema_params, params, ema_decay)
               if ema_decay > 0 else state.ema_params)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state, ema_params=ema)
        metrics = dict(comps)
        metrics["loss"] = loss
        if hasattr(opt_state, "total_notfinite"):
            # apply_if_finite guard active: running count of skipped steps
            metrics["opt_notfinite"] = opt_state.total_notfinite
        if grad_norms:
            metrics["grad_norms"] = _grad_norm_tree(grads)
        return new_state, metrics

    return train_step


def make_gan_train_step(
    model_apply: Callable,
    loss_apply: Callable,
    disc_apply: Callable,
    tx: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    scale_factor: int = 4,
    gan_weight: float = 0.005,
    gan_type: str = "vanilla",
    d_updates_per_g: int = 1,
    compute_dtype=None,
    grad_norms: bool = False,
    ema_decay: float = 0.0,
    guard_stats: bool = False,
) -> Callable:
    """Adversarial step (reference trainer.py:423-505): d_updates_per_g
    discriminator updates on (hr, stop_grad(sr)), then one generator update
    with content + gan_weight * adversarial loss — all in one XLA program.

    `guard_stats` (set with skip_nonfinite optimizers): the BN running
    stats are NOT under the optimizer guard — a NaN batch would poison
    them permanently even while apply_if_finite protects params — so on a
    non-finite step the step's INPUT d_stats are kept instead."""

    def train_step(state: TrainState, hr: jax.Array) -> Tuple[TrainState, Dict[str, jax.Array]]:
        hr = hr.astype(jnp.float32)
        lr_img = bicubic_down(hr, scale_factor)

        # ONE generator forward serves both roles: its value (detached) is
        # the fake batch for the D updates, and its vjp closure carries the
        # gradient path for the G update afterwards — the reference runs a
        # separate no_grad forward for the fakes (trainer.py:431-436), which
        # here would cost a full extra G forward per step.
        sr, g_pullback = jax.vjp(
            lambda p: model_apply(p, lr_img, train=True, dtype=compute_dtype),
            state.params,
        )
        sr_for_d = jax.lax.stop_gradient(sr)

        d_params, d_stats, d_opt_state = state.d_params, state.d_stats, state.d_opt_state
        d_loss = d_real_score = d_fake_score = jnp.asarray(0.0, jnp.float32)
        for _ in range(d_updates_per_g):
            def d_loss_fn(dp, stats):
                d_real, stats = disc_apply(dp, stats, hr, train=True)
                d_fake, stats = disc_apply(dp, stats, sr_for_d, train=True)
                loss_real = gan_loss(d_real, True, gan_type)
                loss_fake = gan_loss(d_fake, False, gan_type)
                return (loss_real + loss_fake) / 2, (stats, d_real, d_fake)

            (d_loss, (d_stats, d_real, d_fake)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_params, d_stats)
            d_updates, d_opt_state = tx_d.update(d_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            d_real_score = jax.nn.sigmoid(d_real).mean()
            d_fake_score = jax.nn.sigmoid(d_fake).mean()

        # Generator update (adversarial term through the updated D): the
        # loss head differentiates w.r.t. the ALREADY-COMPUTED sr, then the
        # cotangent pulls back through the single generator forward above.
        # d_stats is threaded as a nondiff aux (BN running stats update).
        def g_head(sr_, stats):
            content, comps = loss_apply(state.loss_params, sr_, hr)
            d_out, stats = disc_apply(d_params, stats, sr_, train=True)
            g_adv = gan_loss(d_out, True, gan_type)
            total = content + gan_weight * g_adv
            comps = dict(comps)
            comps["g_adv"] = g_adv
            return total, (comps, stats)

        (g_loss, (comps, d_stats)), sr_bar = jax.value_and_grad(
            g_head, has_aux=True
        )(sr, d_stats)
        (grads,) = g_pullback(sr_bar)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if guard_stats:
            # any non-finite activation anywhere makes the losses
            # non-finite; revert the BN running stats to the step's input
            # so one bad batch can't poison every later D forward
            ok = jnp.isfinite(g_loss) & jnp.isfinite(d_loss)
            d_stats = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old),
                d_stats, state.d_stats)
        ema = (_ema_update(state.ema_params, params, ema_decay)
               if ema_decay > 0 else state.ema_params)

        new_state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            d_params=d_params,
            d_stats=d_stats,
            d_opt_state=d_opt_state,
            ema_params=ema,
        )
        metrics = dict(comps)
        metrics.update({
            "loss": g_loss,
            "d_loss": d_loss,
            "d_real": d_real_score,
            "d_fake": d_fake_score,
        })
        if hasattr(opt_state, "total_notfinite"):
            metrics["opt_notfinite"] = opt_state.total_notfinite
        if hasattr(d_opt_state, "total_notfinite"):
            # the D has its own guard (reference: separate D GradScaler) —
            # its silent skips must be visible too
            metrics["d_opt_notfinite"] = d_opt_state.total_notfinite
        if grad_norms:
            metrics["grad_norms"] = _grad_norm_tree(grads)
        return new_state, metrics

    return train_step


def make_eval_step(
    model_apply: Callable,
    loss_apply: Callable,
    scale_factor: int = 4,
    use_ema: bool = False,
) -> Callable:
    """Validation step (reference trainer.py:552-598): eval-mode (clamped)
    forward, combined loss, batch PSNR (10*log10(1/mse)) and SSIM.
    `use_ema`: validate the EMA weights (what EMA-enabled runs serve), so
    best-model selection and early stopping track the served model."""
    from facesr.losses.ssim import ssim as ssim_fn

    def eval_step(state: TrainState, hr: jax.Array):
        hr = hr.astype(jnp.float32)
        lr_img = bicubic_down(hr, scale_factor)
        if use_ema and state.ema_params is None:
            raise ValueError(
                "make_eval_step(use_ema=True) on a TrainState without EMA "
                "weights (ema_params is None — restored from a non-EMA "
                "run?); build the step with use_ema=False")
        params = state.ema_params if use_ema else state.params
        sr = model_apply(params, lr_img, train=False, dtype=None)
        loss, _ = loss_apply(state.loss_params, sr, hr)
        mse = jnp.mean((sr - hr) ** 2)
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
        ssim_val = ssim_fn(sr, hr)
        return {"loss": loss, "psnr": psnr, "ssim": ssim_val}, sr, lr_img

    return eval_step
