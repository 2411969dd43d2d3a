"""3D NMS, jit-friendly and batch-parallel.

``aligned_3d_nms_mask`` reproduces the reference's ``aligned_3d_nms``
(reference mmdet3d/core/post_processing/box3d_nms.py:129): greedy
class-aware NMS over axis-aligned (corner-minmax) boxes, suppressing a box
only when IoU > thresh *and* the classes match.

Greedy NMS is solved by ``greedy_keep_fixpoint``: instead of N sequential
argmax-and-suppress steps (a latency chain of tiny ops, and under vmap
every lane serializes its own loop), the keep mask is computed as the
unique fixpoint of the greedy recursion in sorted-score space —
``k[j] = valid[j] & ~any(k[i] & sup[i, j] for i < j)`` — iterated as a
whole-vector update. The fixpoint is reached in suppression-chain-depth
iterations (typically < 8), each one (N, N) elementwise+reduce pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _greedy_keep_sequential(sup, scores, valid):
    """Reference formulation: N sequential argmax steps (test oracle for
    the fixpoint solver; not used in production paths)."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    alive = valid
    keep = jnp.zeros_like(valid)

    def cond(state):
        return jnp.any(state[0])

    def body(state):
        alive, keep = state
        i = jnp.argmax(jnp.where(alive, scores, neg_inf))
        keep = keep.at[i].set(True)
        alive = alive & ~sup[i]
        alive = alive.at[i].set(False)
        return alive, keep

    return jax.lax.while_loop(cond, body, (alive, keep))[1]


def greedy_keep_fixpoint(sup, scores, valid):
    """Greedy-by-descending-score keep mask (first-index tie order).

    Args:
        sup: (N, N) bool; ``sup[i, j]`` True if box ``i``, when kept,
            suppresses box ``j``. The diagonal is ignored.
        scores: (N,) selection priority.
        valid: (N,) bool; invalid boxes are never kept and never suppress.
    Returns:
        (N,) bool keep mask, identical to the sequential greedy loop.

    The greedy recursion in sorted order is strictly triangular, so its
    fixpoint is unique and equals the sequential result; iterating the
    whole-vector update converges in suppression-chain-depth rounds.
    """
    n = scores.shape[0]
    if n == 0:
        return valid
    order = jnp.argsort(-scores)  # stable: equal scores keep index order
    S = sup[order][:, order]
    iot = jnp.arange(n)
    S = S & (iot[:, None] < iot[None, :])  # only earlier boxes suppress
    v = valid[order]

    def cond(state):
        k, k_prev = state
        return jnp.any(k != k_prev)

    def body(state):
        k, _ = state
        suppressed = jnp.any(S & k[:, None], axis=0)
        return v & ~suppressed, k

    k, _ = jax.lax.while_loop(cond, body, (v, ~v))
    return jnp.zeros_like(k).at[order].set(k)


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
    valid = jnp.ones((n,), bool) if valid_mask is None else valid_mask
    return greedy_keep_fixpoint(iou > thresh, scores, valid)
