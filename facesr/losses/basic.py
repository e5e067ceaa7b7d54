"""Pixel losses: L1, L2, Charbonnier (reference src/losses/combined.py:38-77)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["l1_loss", "l2_loss", "charbonnier_loss"]


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.square(pred - target).mean()


def charbonnier_loss(pred: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-6) -> jnp.ndarray:
    diff = pred - target
    return jnp.sqrt(diff * diff + epsilon * epsilon).mean()
