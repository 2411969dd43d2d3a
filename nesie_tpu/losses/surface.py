"""Surface (per-side) regression losses (reference
mmdet3d/models/losses/surface_loss.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import mse_loss, smooth_l1_loss, softmax_cross_entropy


def bbox_to_surface(bbox):
    """(..., >=6) center-size box -> (..., 6) face coords (Bbox2Surface)."""
    c = bbox[..., :3]
    s = bbox[..., 3:6]
    return jnp.concatenate([c - 0.5 * s, c + 0.5 * s], axis=-1)


def transform_surface(surface, center, scale):
    """World-space face coords -> normalized per-side offsets in [0, 1]
    (TransformSurface, surface_loss.py:102)."""
    lo = center - surface[..., :3]
    hi = surface[..., 3:] - center
    return jnp.concatenate([lo, hi], axis=-1) / scale


def surface_to_prob(target, reg_max: int):
    """Continuous normalized offsets -> two one-hot bin targets + weights
    (Surface2Prob, surface_loss.py:113). Out-of-range targets collapse to
    the reference's (bin0/bin1) fallback.

    Args:
        target: (..., ) in ~[0, 1].
    Returns:
        (left_bin, right_bin) int32, (left_w, right_w) float.
    """
    step = 1.0 / reg_max
    left = jnp.floor(target / step)
    right = left + 1
    right_w = (target % step) / step
    left_w = 1.0 - right_w
    under = left < 0
    over = right > reg_max
    bad = under | over
    left = jnp.where(bad, 0.0, left)
    right = jnp.where(bad, 1.0, right)
    left_w = jnp.where(under, 1.0, jnp.where(over, 0.0, left_w))
    right_w = jnp.where(under, 0.0, jnp.where(over, 1.0, right_w))
    return left.astype(jnp.int32), right.astype(jnp.int32), left_w, right_w


def surface_loss_mse(pred_surface, target_bbox):
    """Elementwise MSE vs Bbox2Surface(target) — the shipped config's mode
    (func_type='MSELoss'). Returns (..., 6) unreduced."""
    return mse_loss(pred_surface, bbox_to_surface(target_bbox))


def surface_loss_smooth_l1(pred_surface, target_bbox, beta: float = 5.0):
    return smooth_l1_loss(pred_surface, bbox_to_surface(target_bbox), beta)


def surface_loss_ce(prob_logits, target_bbox, center, scale, reg_max: int,
                    weight=None):
    """CE-on-distribution mode: soft binning of the normalized target.

    Args:
        prob_logits: (N, 6, reg_max+1) side distribution logits.
        target_bbox: (N, >=6); center: (N, 3); scale: (N, 6).
    Returns:
        scalar sum.
    """
    target = transform_surface(bbox_to_surface(target_bbox), center, scale)
    lb, rb, lw, rw = surface_to_prob(target, reg_max)
    loss = softmax_cross_entropy(prob_logits, lb) * lw
    loss = loss + softmax_cross_entropy(prob_logits, rb) * rw
    if weight is not None:
        loss = loss * weight
    return jnp.sum(loss)
