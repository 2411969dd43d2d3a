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


def weighted_smooth_l1(pred, target, beta: float = 1.0 / 9.0,
                       code_weights=None, weights=None):
    """PCDet-style code-weighted smooth-L1 (reference
    weighted_smooth_l1_loss.py:8-69, oracle-tested): NaN targets are
    ignored (replaced by the prediction), code weights scale the *diff*
    before the kernel, ``beta < 1e-5`` degrades to pure L1, and the
    per-anchor ``weights`` multiply the unreduced (B, A, C) loss.

    Args:
        pred/target: (B, A, C); code_weights: (C,) or None;
        weights: (B, A) or None.
    Returns:
        (B, A, C) unreduced loss.
    """
    target = jnp.where(jnp.isnan(target), pred, target)
    diff = pred - target
    if code_weights is not None:
        diff = diff * jnp.asarray(code_weights, diff.dtype).reshape(1, 1, -1)
    n = jnp.abs(diff)
    if beta < 1e-5:
        loss = n
    else:
        loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights[..., None]
    return loss


# Axis-aligned corner template of reference box_utils.boxes_to_corners_3d
# (box_utils.py:27-30). NOTE the reference never rotates the corners by the
# heading (upstream PCDet does) — we reproduce that quirk; see
# REFERENCE_QUIRKS.md.
_CORNER_TEMPLATE = jnp.array(
    [[1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
     [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1]], jnp.float32) / 2.0


def corner_loss_lidar(pred_boxes, gt_boxes):
    """Corner-distance smooth-L1 (reference
    weighted_smooth_l1_loss.py:71-90 + box_utils.boxes_to_corners_3d,
    oracle-tested). Heading (column 6) is ignored, as in the reference.

    Args:
        pred_boxes/gt_boxes: (N, 7) [x, y, z, dx, dy, dz, heading].
    Returns:
        (N,) per-box mean corner loss.
    """
    def corners(b):
        return b[:, None, 0:3] + b[:, None, 3:6] * _CORNER_TEMPLATE
    dist = jnp.linalg.norm(corners(pred_boxes) - corners(gt_boxes), axis=2)
    return jnp.mean(smooth_l1_loss(dist, jnp.zeros_like(dist), beta=1.0),
                    axis=1)
