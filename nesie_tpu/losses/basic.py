"""Elementary weighted losses matching torch/mmdet reductions."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce(loss, weight=None, reduction: str = "mean", avg_factor=None):
    """mmdet-style weighted reduction."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is not None:
        return jnp.sum(loss) / avg_factor
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def mse_loss(pred, target):
    return (pred - target) ** 2


def l1_loss(pred, target):
    return jnp.abs(pred - target)


def smooth_l1_loss(pred, target, beta: float = 1.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def softmax_cross_entropy(logits, labels, class_weight=None):
    """Per-element CE with integer labels; matches F.cross_entropy(…,
    weight=class_weight, reduction='none').

    Args:
        logits: (..., C); labels: (...,) int.
    Returns:
        (...,) loss.
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss = -picked
    if class_weight is not None:
        cw = jnp.asarray(class_weight, logits.dtype)
        loss = loss * cw[labels]
    return loss


def binary_cross_entropy(prob, target, eps: float = 1e-12):
    """BCE on probabilities (torch F.binary_cross_entropy, clamped)."""
    prob = jnp.clip(prob, eps, 1.0 - eps)
    return -(target * jnp.log(prob) + (1.0 - target) * jnp.log(1.0 - prob))
