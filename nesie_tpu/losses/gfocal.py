"""Generalized Focal Loss pieces (reference
mmdet3d/models/losses/gfocal_loss.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import binary_cross_entropy, softmax_cross_entropy


def quality_focal_loss(pred, label, score, beta: float = 2.0,
                       use_sigmoid: bool = True):
    """QFL: negatives supervised towards 0, positives towards the quality
    score at their class slot (gfocal_loss.py:9).

    Args:
        pred: (N, C) logits if ``use_sigmoid`` else probabilities.
        label: (N,) int class ids; ids outside [0, C) count as background.
        score: (N,) quality (IoU) targets.
    Returns:
        (N,) per-sample loss (summed over classes).
    """
    num_classes = pred.shape[-1]
    prob = jax.nn.sigmoid(pred) if use_sigmoid else pred

    if use_sigmoid:
        # BCE-with-logits against target 0 == softplus(logit)
        zero_bce = jnp.maximum(pred, 0) + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    else:
        zero_bce = binary_cross_entropy(prob, jnp.zeros_like(prob))
    loss = zero_bce * prob**beta  # (N, C)

    pos = (label >= 0) & (label < num_classes)
    safe_label = jnp.clip(label, 0, num_classes - 1)
    p_at = jnp.take_along_axis(prob, safe_label[..., None], axis=-1)[..., 0]
    if use_sigmoid:
        logit_at = jnp.take_along_axis(pred, safe_label[..., None], axis=-1)[..., 0]
        pos_bce = (
            jnp.maximum(logit_at, 0)
            - logit_at * score
            + jnp.log1p(jnp.exp(-jnp.abs(logit_at)))
        )
    else:
        pos_bce = binary_cross_entropy(p_at, score)
    pos_loss = pos_bce * jnp.abs(score - p_at) ** beta

    onehot = jax.nn.one_hot(safe_label, num_classes, dtype=loss.dtype)
    replace = pos[..., None] & (onehot > 0)
    loss = jnp.where(replace, pos_loss[..., None], loss)
    return jnp.sum(loss, axis=-1)


def distribution_focal_loss(pred_logits, label):
    """DFL over the discrete distribution (gfocal_loss.py:55).

    Args:
        pred_logits: (N, n+1); label: (N,) continuous in [0, n].
    Returns:
        (N,) loss.
    """
    left = jnp.floor(label).astype(jnp.int32)
    n = pred_logits.shape[-1] - 1
    left = jnp.clip(left, 0, n - 1)
    right = left + 1
    wl = right.astype(label.dtype) - label
    wr = label - left.astype(label.dtype)
    return (
        softmax_cross_entropy(pred_logits, left) * wl
        + softmax_cross_entropy(pred_logits, right) * wr
    )
