"""PCDet-convention rotated IoU + NMS (reference
mmdet3d/ops/pcdet_nms/pcdet_nms_utils.py + src/iou3d_nms_kernel.cu).

Boxes are ``(x, y, z, dx, dy, dz, heading)`` with z the GRAVITY center and
heading a counterclockwise BEV rotation (iou3d_nms_kernel.cu:94-98) — the
same corner convention as ``core.iou.bev_corners``, so these are thin,
tested adapters over the shared polygon-clipping core rather than a second
implementation.

Differences from the mmdet3d-convention ops in ``core.multiclass_nms``:
  * center-format boxes (not BEV corner-format [x1,y1,x2,y2,ry]);
  * ``boxes_iou3d``'s height overlap uses center z +/- dz/2
    (pcdet_nms_utils.py:56-76);
  * ``nms`` returns kept ORIGINAL indices in descending-score order plus
    None, matching ``nms_gpu``'s (indices, None) tuple
    (pcdet_nms_utils.py:84-101);
  * ``nms_normal`` ignores heading entirely — axis-aligned BEV IoU
    (kernel's iou_normal).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .iou import bev_corners, rotated_intersection_area_2d


def _bev5(boxes7):
    return jnp.concatenate(
        [boxes7[:, 0:2], boxes7[:, 3:5], boxes7[:, 6:7]], axis=1
    )


def boxes_iou_bev(boxes_a, boxes_b, eps: float = 1e-8):
    """(N, 7), (M, 7) -> (N, M) rotated BEV IoU (pcdet boxes_iou_bev)."""
    boxes_a, boxes_b = jnp.asarray(boxes_a), jnp.asarray(boxes_b)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca = bev_corners(_bev5(boxes_a))
    cb = bev_corners(_bev5(boxes_b))
    inter = rotated_intersection_area_2d(
        jnp.repeat(ca[:, None], m, axis=1).reshape(n * m, 4, 2),
        jnp.repeat(cb[None, :], n, axis=0).reshape(n * m, 4, 2),
    ).reshape(n, m)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


def boxes_iou3d(boxes_a, boxes_b):
    """(N, 7), (M, 7) -> (N, M) 3D IoU with center-z height overlap
    (pcdet_nms_utils.py boxes_iou3d_gpu:45-78)."""
    boxes_a, boxes_b = jnp.asarray(boxes_a), jnp.asarray(boxes_b)
    n, m = boxes_a.shape[0], boxes_b.shape[0]
    ca = bev_corners(_bev5(boxes_a))
    cb = bev_corners(_bev5(boxes_b))
    overlaps_bev = rotated_intersection_area_2d(
        jnp.repeat(ca[:, None], m, axis=1).reshape(n * m, 4, 2),
        jnp.repeat(cb[None, :], n, axis=0).reshape(n * m, 4, 2),
    ).reshape(n, m)

    a_max = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    a_min = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    b_max = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    b_min = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    overlaps_h = jnp.clip(
        jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0, None
    )
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-6)


def nms(boxes, scores, thresh: float, pre_maxsize: int | None = None):
    """Rotated-BEV greedy NMS (pcdet nms_gpu, pcdet_nms_utils.py:84-101).

    Returns (kept original indices in descending-score order, None).
    """
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="stable")
    if pre_maxsize is not None:
        order = order[:pre_maxsize]
    boxes = jnp.asarray(boxes)[order]
    iou = np.asarray(boxes_iou_bev(boxes, boxes))
    keep = []
    suppressed = np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
    return np.asarray(order[keep]), None


def nms_normal(boxes, scores, thresh: float):
    """Axis-aligned BEV NMS, heading ignored (pcdet nms_normal_gpu +
    kernel iou_normal)."""
    boxes = np.asarray(boxes)
    scores = np.asarray(scores)
    order = np.argsort(-scores, kind="stable")
    b = boxes[order]
    x1, x2 = b[:, 0] - b[:, 3] / 2, b[:, 0] + b[:, 3] / 2
    y1, y2 = b[:, 1] - b[:, 4] / 2, b[:, 1] + b[:, 4] / 2
    ix = np.clip(
        np.minimum(x2[:, None], x2[None, :]) - np.maximum(x1[:, None], x1[None, :]),
        0, None,
    )
    iy = np.clip(
        np.minimum(y2[:, None], y2[None, :]) - np.maximum(y1[:, None], y1[None, :]),
        0, None,
    )
    inter = ix * iy
    area = b[:, 3] * b[:, 4]
    iou = inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-8)
    keep = []
    suppressed = np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
    return np.asarray(order[keep]), None
