"""Combined SR loss with component tracking.

Functional redesign of reference `src/losses/combined.py:80-302`: the loss
is a pure function `(loss_params, pred, target) -> (total, components)`
suitable for jit/grad, with static weights baked into the closure at
construction. `loss_params` carries the frozen VGG pytree (empty when
perceptual weight is 0) through the jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from facesr.losses.basic import l1_loss, l2_loss, charbonnier_loss
from facesr.losses.ssim import ssim_loss, ms_ssim_loss
from facesr.losses.perceptual import init_perceptual, perceptual_loss

__all__ = ["LossConfig", "CombinedLoss", "LossTracker", "create_loss_function"]


@dataclass
class LossConfig:
    """Mirrors reference LossConfig (combined.py:16-35)."""

    l1_weight: float = 1.0
    l2_weight: float = 0.0
    perceptual_weight: float = 0.01
    ssim_weight: float = 0.1
    ms_ssim_weight: float = 0.0

    use_charbonnier: bool = False
    charbonnier_eps: float = 1e-3

    perceptual_layers: list = field(default_factory=lambda: ["conv3_4", "conv4_4"])

    ssim_window_size: int = 11


class CombinedLoss:
    """Weighted sum of enabled loss terms, returning (total, {name: value}).

    Only terms with weight > 0 are built (reference combined.py:112-142).
    Construction may allocate VGG params; `apply` is pure and jit-safe.
    """

    def __init__(
        self,
        config: Optional[LossConfig] = None,
        vgg_params: Optional[List[Dict[str, jax.Array]]] = None,
        seed: int = 0,
        **kwargs,
    ):
        # copy before applying overrides: mutating a caller-shared config
        # would leak this instance's kwargs into every other consumer
        cfg = replace(config) if config is not None else LossConfig()
        for k, v in kwargs.items():
            if not hasattr(cfg, k):
                raise TypeError(f"Unknown LossConfig field: {k!r}")
            setattr(cfg, k, v)
        self.config = cfg
        self.weights: Dict[str, float] = {}
        if cfg.l1_weight > 0:
            self.weights["l1"] = cfg.l1_weight
        if cfg.l2_weight > 0:
            self.weights["l2"] = cfg.l2_weight
        if cfg.perceptual_weight > 0:
            self.weights["perceptual"] = cfg.perceptual_weight
        if cfg.ssim_weight > 0:
            self.weights["ssim"] = cfg.ssim_weight
        if cfg.ms_ssim_weight > 0:
            self.weights["ms_ssim"] = cfg.ms_ssim_weight

        if cfg.perceptual_weight > 0:
            self.params: Dict[str, Any] = {
                "vgg": init_perceptual(
                    jax.random.PRNGKey(seed),
                    layers=tuple(cfg.perceptual_layers),
                    pretrained_params=vgg_params,
                )
            }
        else:
            self.params = {}

    def apply(
        self, loss_params: Dict[str, Any], pred: jax.Array, target: jax.Array,
        compute_dtype=None, vgg_remat=None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """Pure loss computation; NHWC [0,1] images.

        Pixel losses and SSIM always run f32 (SSIM's E[x^2]-E[x]^2 window
        math cancels catastrophically below f32 — see facesr.ops.conv).
        `compute_dtype=bf16` applies the trainer's mixed-precision policy to
        the VGG perceptual sweep, whose 256^2-resolution convs otherwise run
        as f32 Precision.HIGHEST on TPU (~8x the MXU cost; measured +57%
        stage-1 step time in BENCH.md)."""
        cfg = self.config
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        components: Dict[str, jax.Array] = {}
        total = jnp.asarray(0.0, jnp.float32)

        if "l1" in self.weights:
            if cfg.use_charbonnier:
                v = charbonnier_loss(pred, target, cfg.charbonnier_eps)
            else:
                v = l1_loss(pred, target)
            components["l1"] = v
            total = total + self.weights["l1"] * v
        if "l2" in self.weights:
            v = l2_loss(pred, target)
            components["l2"] = v
            total = total + self.weights["l2"] * v
        if "perceptual" in self.weights:
            v = perceptual_loss(
                loss_params["vgg"], pred, target, layers=tuple(cfg.perceptual_layers),
                dtype=compute_dtype, remat=vgg_remat,
            )
            components["perceptual"] = v
            total = total + self.weights["perceptual"] * v
        if "ssim" in self.weights:
            v = ssim_loss(pred, target, window_size=cfg.ssim_window_size)
            components["ssim"] = v
            total = total + self.weights["ssim"] * v
        if "ms_ssim" in self.weights:
            v = ms_ssim_loss(pred, target)
            components["ms_ssim"] = v
            total = total + self.weights["ms_ssim"] * v

        components["total"] = total
        return total, components

    def __call__(self, pred: jax.Array, target: jax.Array):
        return self.apply(self.params, pred, target)

    def update_weight(self, name: str, weight: float) -> None:
        """Runtime weight change (reference combined.py:179-184). Note: a
        jitted step closing over weights must be rebuilt afterwards.
        The term SET is fixed at construction (weight-0 terms were never
        built — params/structure live in the compiled program): setting an
        existing term to 0.0 zeroes its contribution but still computes it
        until the step is rebuilt, and a term omitted at construction
        cannot be enabled here — build a new CombinedLoss instead."""
        if name not in self.weights:
            raise ValueError(f"Unknown loss component: {name}")
        self.weights[name] = weight

    def get_weights(self) -> Dict[str, float]:
        return dict(self.weights)


class LossTracker:
    """Moving-average / epoch-average tracker (reference combined.py:206-275)."""

    def __init__(self, window_size: int = 100):
        self.window_size = window_size
        self.history: Dict[str, list] = {}
        self.epoch_history: Dict[str, list] = {}

    def update(self, loss_dict: Dict[str, Any]) -> None:
        for name, value in loss_dict.items():
            self.history.setdefault(name, []).append(float(value))

    def get_moving_average(self, name: str) -> float:
        vals = self.history.get(name, [])
        if not vals:
            return 0.0
        vals = vals[-self.window_size:]
        return sum(vals) / len(vals)

    def get_epoch_average(self, name: str) -> float:
        vals = self.history.get(name, [])
        if not vals:
            return 0.0
        return sum(vals) / len(vals)

    def end_epoch(self) -> Dict[str, float]:
        avgs = {}
        for name, vals in self.history.items():
            if vals:
                avg = sum(vals) / len(vals)
                avgs[name] = avg
                self.epoch_history.setdefault(name, []).append(avg)
        self.history = {name: [] for name in self.history}
        return avgs

    def get_summary(self) -> Dict[str, Any]:
        summary = {}
        for name, vals in self.epoch_history.items():
            if vals:
                summary[name] = {
                    "current": vals[-1],
                    "best": min(vals),
                    "worst": max(vals),
                    "mean": sum(vals) / len(vals),
                }
        return summary

    def to_dict(self) -> Dict[str, list]:
        return dict(self.epoch_history)


def create_loss_function(
    l1_weight: float = 1.0,
    perceptual_weight: float = 0.01,
    ssim_weight: float = 0.1,
    **kwargs,
) -> CombinedLoss:
    """Factory matching reference `create_loss_function` (combined.py:278-302)."""
    vgg_params = kwargs.pop("vgg_params", None)
    cfg = LossConfig(
        l1_weight=l1_weight,
        perceptual_weight=perceptual_weight,
        ssim_weight=ssim_weight,
    )
    for k, v in kwargs.items():
        if not hasattr(cfg, k):
            # silent dropping turns typos into wrong loss weights —
            # raise like CombinedLoss.__init__ does for the same input
            raise TypeError(
                f"create_loss_function got unknown argument {k!r} "
                f"(valid: LossConfig fields)")
        setattr(cfg, k, v)
    return CombinedLoss(cfg, vgg_params=vgg_params)
