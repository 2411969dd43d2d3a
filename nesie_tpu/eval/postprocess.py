"""Test-time decode + NMS (reference NesieHead.get_bboxes /
multiclass_nms_single, nesie_head.py:681-788), jit-friendly.

The variable-length per-class proposal expansion happens on the host in
``expand_per_class`` (eval is offline); everything up to the keep mask is
static-shape jax.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nesie_tpu.core.boxes import box_corners, corners_minmax, points_in_boxes
from nesie_tpu.core.nms import aligned_3d_nms_mask


@partial(jax.jit, static_argnames=("nms_thr", "score_thr", "use_iou_for_nms"))
def decode_and_nms(
    results,
    points,
    nms_thr: float = 0.25,
    score_thr: float = 0.05,
    use_iou_for_nms: bool = True,
):
    """Batched decode + class-aware NMS.

    Args:
        results: head results dict (obj_scores, sem_scores, bbox_preds,
            iou_scores).
        points: (B, N, >=3) the input clouds (for the nonempty-box filter).
    Returns:
        dict with bbox (B, P, 7) gravity-centered boxes,
        obj_scores (B, P), sem_scores (B, P, C), selected (B, P) bool.
    """
    # SAQE's get_bboxes scores objectness from the quality module's R_obj
    # branch (saqe_head.py:434); Nesie uses the prediction head's.
    obj_logits = results.get("R_obj_scores", results["obj_scores"])
    obj = jax.nn.softmax(obj_logits, axis=-1)[..., -1]  # (B, P)
    sem = jax.nn.softmax(results["sem_scores"], axis=-1)  # (B, P, C)
    bbox = results["bbox_preds"]  # (B, P, 7)

    if use_iou_for_nms:
        sem_argmax = jnp.argmax(results["sem_scores"], axis=-1)
        iou_at = jnp.take_along_axis(
            results["iou_scores"], sem_argmax[..., None], axis=-1
        )[..., 0]
        obj = obj * iou_at

    def one_sample(bbox_b, obj_b, sem_b, pts_b):
        inside = points_in_boxes(pts_b[:, :3], bbox_b, bottom_center=False)
        nonempty = jnp.sum(inside, axis=0) > 5  # (P,)
        mm = corners_minmax(box_corners(bbox_b))  # (P, 6)
        classes = jnp.argmax(sem_b, axis=-1)
        keep = aligned_3d_nms_mask(mm, obj_b, classes, nms_thr, valid_mask=nonempty)
        selected = keep & (obj_b > score_thr)
        return selected

    selected = jax.vmap(one_sample)(bbox, obj, sem, points)
    return dict(bbox=bbox, obj_scores=obj, sem_scores=sem, selected=selected)


def expand_per_class(decoded_b):
    """Host-side per-class proposal expansion for one sample
    (nesie_head.py:772-782).

    Args:
        decoded_b: dict of numpy arrays for ONE sample: bbox (P, 7),
            obj_scores (P,), sem_scores (P, C), selected (P,).
    Returns:
        boxes (S*C, 7), scores (S*C,), labels (S*C,) numpy arrays.
    """
    sel = np.asarray(decoded_b["selected"]).astype(bool)
    bbox = np.asarray(decoded_b["bbox"])[sel]
    obj = np.asarray(decoded_b["obj_scores"])[sel]
    sem = np.asarray(decoded_b["sem_scores"])[sel]
    C = sem.shape[-1]
    boxes, scores, labels = [], [], []
    for k in range(C):
        boxes.append(bbox)
        scores.append(obj * sem[:, k])
        labels.append(np.full(len(bbox), k, np.int64))
    return (
        np.concatenate(boxes, 0) if boxes else np.zeros((0, 7)),
        np.concatenate(scores, 0) if scores else np.zeros((0,)),
        np.concatenate(labels, 0) if labels else np.zeros((0,), np.int64),
    )
