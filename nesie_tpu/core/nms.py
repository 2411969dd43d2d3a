"""3D NMS as fixed-shape masked loops (jit-friendly).

``aligned_3d_nms_mask`` reproduces the reference's ``aligned_3d_nms``
(reference mmdet3d/core/post_processing/box3d_nms.py:129): greedy
class-aware NMS over axis-aligned (corner-minmax) boxes, suppressing a box
only when IoU > thresh *and* the classes match.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _aligned_iou_matrix(boxes6, eps=1e-12):
    """(N, 6) minmax boxes -> (N, N) IoU matrix."""
    lt = jnp.maximum(boxes6[:, None, :3], boxes6[None, :, :3])
    rb = jnp.minimum(boxes6[:, None, 3:], boxes6[None, :, 3:])
    whd = jnp.clip(rb - lt, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    d = boxes6[:, 3:] - boxes6[:, :3]
    vol = d[:, 0] * d[:, 1] * d[:, 2]
    union = vol[:, None] + vol[None, :] - inter
    return inter / jnp.maximum(union, eps)


def aligned_3d_nms_mask(boxes6, scores, classes, thresh, valid_mask=None):
    """Greedy class-aware axis-aligned 3D NMS.

    Args:
        boxes6: (N, 6) ``(x1, y1, z1, x2, y2, z2)``.
        scores: (N,).
        classes: (N,) int class ids.
        thresh: IoU threshold; a box is suppressed iff IoU > thresh with a
            higher-scored kept box *of the same class*.
        valid_mask: (N,) optional bool; invalid boxes are never selected.

    Returns:
        (N,) bool keep mask.
    """
    n = boxes6.shape[0]
    iou = _aligned_iou_matrix(boxes6)
    iou = iou * (classes[:, None] == classes[None, :])

    alive = jnp.ones((n,), bool) if valid_mask is None else valid_mask
    keep = jnp.zeros((n,), bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, keep = state
        masked = jnp.where(alive, scores, neg_inf)
        i = jnp.argmax(masked)
        keep = keep.at[i].set(True)
        suppress = iou[i] > thresh
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return alive, keep

    _, keep = jax.lax.while_loop(cond, body, (alive, keep))
    return keep
