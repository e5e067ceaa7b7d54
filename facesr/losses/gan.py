"""GAN losses: vanilla (BCE-with-logits), lsgan (MSE), wgan (raw scores).

Semantics match reference `src/models/discriminator.py:140-193`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gan_loss", "GAN_TYPES"]

GAN_TYPES = ("vanilla", "lsgan", "wgan")


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    # Numerically stable BCEWithLogits: max(x,0) - x*t + log(1+exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ).mean()


def gan_loss(
    prediction: jax.Array,
    is_real: bool,
    gan_type: str = "vanilla",
    real_label: float = 1.0,
    fake_label: float = 0.0,
) -> jax.Array:
    """Adversarial loss on discriminator logits."""
    if gan_type == "wgan":
        return -prediction.mean() if is_real else prediction.mean()
    target_val = real_label if is_real else fake_label
    target = jnp.full_like(prediction, target_val)
    if gan_type == "vanilla":
        return _bce_with_logits(prediction, target)
    if gan_type == "lsgan":
        return jnp.square(prediction - target).mean()
    raise ValueError(f"Unknown GAN type: {gan_type}")
