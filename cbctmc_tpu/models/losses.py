"""Losses for the DL subsystems (reference: cbctmc/segmentation/losses.py,
cbctmc/speedup/trainer.py:411-447)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss(
    probs: jnp.ndarray, targets: jnp.ndarray, smooth: float = 1e-5
) -> jnp.ndarray:
    """Soft Dice loss averaged over channels; inputs [B, *spatial, C]
    with probabilities and binary targets."""
    axes = tuple(range(1, probs.ndim - 1))
    intersection = jnp.sum(probs * targets, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(targets, axis=axes)
    dice = (2.0 * intersection + smooth) / (denom + smooth)
    return 1.0 - dice.mean()


def segmentation_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    n_softmax: int = 8,
) -> jnp.ndarray:
    """Dice on the softmax tissue group + Dice on the sigmoid vessel
    channel (the reference trains with a MONAI-style DiceLoss on both
    groups, segmentation/losses.py:10)."""
    probs_soft = jax.nn.softmax(logits[..., :n_softmax], axis=-1)
    probs_sig = jax.nn.sigmoid(logits[..., n_softmax:])
    return dice_loss(probs_soft, targets[..., :n_softmax]) + dice_loss(
        probs_sig, targets[..., n_softmax:]
    )


def l1_loss(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(prediction - target).mean()


def gaussian_nll_loss(
    mean: jnp.ndarray,
    variance: jnp.ndarray,
    target: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Negative log likelihood of target under Normal(mean, variance) —
    trains the speedup model's variance head."""
    variance = jnp.maximum(variance, eps)
    return 0.5 * (jnp.log(variance) + (target - mean) ** 2 / variance).mean()
