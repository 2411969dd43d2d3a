"""IoU computations: axis-aligned 3D IoU and differentiable rotated 3D IoU.

The rotated IoU reproduces the semantics of the reference's vendored
Rotated_IoU package (reference mmdet3d/ops/rotated_iou/oriented_iou_loss.py
+ box_intersection_2d.py): polygon clipping of the two BEV rectangles with
up to 24 candidate vertices, an angle sort replacing the CUDA
``sort_vertices`` op, and a shoelace area — fully vectorized, fixed shapes,
differentiable w.r.t. both boxes (sort indices are integer and detached,
exactly as in the reference).

Boxes are ``(cx, cy, cz_gravity, sx, sy, sz, yaw)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Axis-aligned IoU (used by eval + AxisAlignedIoULoss)
# ---------------------------------------------------------------------------

def axis_aligned_overlap_3d(boxes1, boxes2, *, aligned: bool = False,
                            mode: str = "iou", eps=1e-10):
    """IoU / GIoU of axis-aligned ``(x1,y1,z1,x2,y2,z2)`` boxes
    (reference axis_aligned_bbox_overlaps_3d, iou3d_calculator.py:201).

    Args:
        boxes1: (..., N, 6); boxes2: (..., M, 6) (or (..., N, 6) if aligned).
        mode: "iou" or "giou".
    Returns:
        (..., N, M) matrix, or (..., N) when ``aligned``.
    """
    assert mode in ("iou", "giou"), mode
    if not aligned:
        boxes1 = boxes1[..., :, None, :]
        boxes2 = boxes2[..., None, :, :]
    lt = jnp.maximum(boxes1[..., :3], boxes2[..., :3])
    rb = jnp.minimum(boxes1[..., 3:], boxes2[..., 3:])
    whd = jnp.clip(rb - lt, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]

    def vol(b):
        d = b[..., 3:] - b[..., :3]
        return d[..., 0] * d[..., 1] * d[..., 2]

    union = jnp.maximum(vol(boxes1) + vol(boxes2) - inter, eps)
    ious = inter / union
    if mode == "iou":
        return ious
    enc = jnp.clip(jnp.maximum(boxes1[..., 3:], boxes2[..., 3:])
                   - jnp.minimum(boxes1[..., :3], boxes2[..., :3]), 0.0)
    enclose = jnp.maximum(enc[..., 0] * enc[..., 1] * enc[..., 2], eps)
    return ious - (enclose - union) / enclose


def axis_aligned_iou_3d(boxes1, boxes2, **kw):
    """IoU of center-size boxes treated as axis-aligned (yaw ignored)."""

    def to_minmax(b):
        return jnp.concatenate(
            [b[..., :3] - 0.5 * b[..., 3:6], b[..., :3] + 0.5 * b[..., 3:6]],
            axis=-1,
        )

    return axis_aligned_overlap_3d(to_minmax(boxes1), to_minmax(boxes2), **kw)


# ---------------------------------------------------------------------------
# Rotated (differentiable) IoU
# ---------------------------------------------------------------------------

def bev_corners(boxes5):
    """(..., 5) ``(x, y, w, h, alpha)`` -> (..., 4, 2) BEV corners.

    Counterclockwise corner order for positive alpha, matching the
    reference's ``box2corners_th`` (oriented_iou_loss.py:6).
    """
    x = boxes5[..., 0:1]
    y = boxes5[..., 1:2]
    w = boxes5[..., 2:3]
    h = boxes5[..., 3:4]
    a = boxes5[..., 4:5]
    sx = jnp.asarray([0.5, -0.5, -0.5, 0.5], boxes5.dtype) * w
    sy = jnp.asarray([0.5, 0.5, -0.5, -0.5], boxes5.dtype) * h
    c, s = jnp.cos(a), jnp.sin(a)
    cx = sx * c - sy * s + x
    cy = sx * s + sy * c + y
    return jnp.stack([cx, cy], axis=-1)


def _edge_intersections(c1, c2):
    """Pairwise segment intersections of two quads.

    Args:
        c1, c2: (..., 4, 2) corners.
    Returns:
        inter: (..., 4, 4, 2); mask: (..., 4, 4) bool.
    """
    roll = [1, 2, 3, 0]
    line1 = jnp.concatenate([c1, c1[..., roll, :]], axis=-1)  # (..., 4, 4)
    line2 = jnp.concatenate([c2, c2[..., roll, :]], axis=-1)
    l1 = line1[..., :, None, :]  # (..., 4, 4edge2, 4)
    l2 = line2[..., None, :, :]
    x1, y1, x2, y2 = l1[..., 0], l1[..., 1], l1[..., 2], l1[..., 3]
    x3, y3, x4, y4 = l2[..., 0], l2[..., 1], l2[..., 2], l2[..., 3]
    num = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    den_t = (x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)
    t_raw = den_t / (num + _EPS)
    t = jnp.where(num == 0.0, -1.0, t_raw)
    mask_t = (t > 0) & (t < 1)
    den_u = (x1 - x2) * (y1 - y3) - (y1 - y2) * (x1 - x3)
    u = jnp.where(num == 0.0, -1.0, -den_u / (num + _EPS))
    mask_u = (u > 0) & (u < 1)
    mask = mask_t & mask_u
    ix = x1 + t_raw * (x2 - x1)
    iy = y1 + t_raw * (y2 - y1)
    inter = jnp.stack([ix, iy], axis=-1) * mask[..., None]
    return inter, mask


def _corners_in_box(c1, c2):
    """(..., 4) bool: corner i of quad c1 inside quad c2 (edge-inclusive)."""
    a = c2[..., 0:1, :]
    b = c2[..., 1:2, :]
    d = c2[..., 3:4, :]
    ab = b - a
    ad = d - a
    am = c1 - a
    p_ab = jnp.sum(ab * am, axis=-1)
    norm_ab = jnp.maximum(jnp.sum(ab * ab, axis=-1), _EPS)
    p_ad = jnp.sum(ad * am, axis=-1)
    norm_ad = jnp.maximum(jnp.sum(ad * ad, axis=-1), _EPS)
    r_ab = p_ab / norm_ab
    r_ad = p_ad / norm_ad
    return (r_ab > -1e-6) & (r_ab < 1 + 1e-6) & (r_ad > -1e-6) & (r_ad < 1 + 1e-6)


def _polygon_area(vertices, mask):
    """Convex-hull-ordered shoelace area over masked candidate vertices.

    Args:
        vertices: (..., 24, 2) candidate intersection-polygon vertices.
        mask: (..., 24) validity.
    Returns:
        (...,) intersection area (0 where no valid vertex).
    """
    num_valid = jnp.sum(mask, axis=-1)  # (...,)
    any_valid = num_valid > 0
    denom = jnp.maximum(num_valid, 1).astype(vertices.dtype)
    mean = jnp.sum(vertices * mask[..., None], axis=-2) / denom[..., None]
    centered = vertices - mean[..., None, :]

    ang = jnp.arctan2(centered[..., 1], centered[..., 0])
    key = jnp.where(mask, ang, jnp.inf)  # invalid last
    order = jnp.argsort(key, axis=-1)  # ascending angle = CCW
    sorted_v = jnp.take_along_axis(centered, order[..., None], axis=-2)
    sorted_m = jnp.take_along_axis(mask, order, axis=-1)
    sorted_v = sorted_v * sorted_m[..., None]  # invalid -> (0,0): zero grads

    x = sorted_v[..., 0]
    y = sorted_v[..., 1]
    # open-chain shoelace: edges v0->v1 ... v22->v23 (zeros contribute 0)
    partial = jnp.sum(x[..., :-1] * y[..., 1:] - y[..., :-1] * x[..., 1:], axis=-1)
    # closing edge v_{n-1} -> v_0
    last_idx = jnp.maximum(num_valid - 1, 0)
    vx_last = jnp.take_along_axis(x, last_idx[..., None], axis=-1)[..., 0]
    vy_last = jnp.take_along_axis(y, last_idx[..., None], axis=-1)[..., 0]
    closing = vx_last * y[..., 0] - vy_last * x[..., 0]
    area = jnp.abs(partial + closing) / 2
    return jnp.where(any_valid, area, 0.0)


def rotated_intersection_area_2d(c1, c2):
    """Intersection area of two BEV quads given their corners (..., 4, 2)."""
    inter, mask_i = _edge_intersections(c1, c2)
    in12 = _corners_in_box(c1, c2)
    in21 = _corners_in_box(c2, c1)
    batch = c1.shape[:-2]
    verts = jnp.concatenate(
        [c1, c2, inter.reshape(batch + (16, 2))], axis=-2
    )  # (..., 24, 2)
    mask = jnp.concatenate([in12, in21, mask_i.reshape(batch + (16,))], axis=-1)
    return _polygon_area(verts, mask)


def iou_bev(boxes5a, boxes5b, eps=_EPS):
    """Rotated BEV IoU of aligned (..., 5) box pairs. Returns iou, union."""
    c1 = bev_corners(boxes5a)
    c2 = bev_corners(boxes5b)
    inter = rotated_intersection_area_2d(c1, c2)
    area1 = boxes5a[..., 2] * boxes5a[..., 3]
    area2 = boxes5b[..., 2] * boxes5b[..., 3]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, eps), union


def iou3d(boxes1, boxes2, eps=_EPS):
    """Differentiable rotated 3D IoU of aligned 7-dof box pairs.

    Semantics of the reference ``cal_iou_3d`` (oriented_iou_loss.py:86):
    BEV polygon-clipped intersection x z-extent overlap.

    Args:
        boxes1, boxes2: (..., 7) gravity-centered boxes, paired elementwise.
    Returns:
        (...,) IoU in [0, 1].
    """
    bev1 = boxes1[..., jnp.array([0, 1, 3, 4, 6])]
    bev2 = boxes2[..., jnp.array([0, 1, 3, 4, 6])]
    zmax1 = boxes1[..., 2] + 0.5 * boxes1[..., 5]
    zmin1 = boxes1[..., 2] - 0.5 * boxes1[..., 5]
    zmax2 = boxes2[..., 2] + 0.5 * boxes2[..., 5]
    zmin2 = boxes2[..., 2] - 0.5 * boxes2[..., 5]
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)
    iou2d, union2d = iou_bev(bev1, bev2)
    inter3d = iou2d * union2d * z_overlap
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    union3d = v1 + v2 - inter3d
    return inter3d / jnp.maximum(union3d, eps)


def _smallest_enclosing_wh(corners):
    """Width/height of the minimum-area enclosing rectangle of 8 BEV points.

    The optimal rectangle has an edge parallel to an edge of the convex
    hull, so scanning all point-pair directions is exact (the reference's
    ``smallest_bounding_box``, min_enclosing_box.py, does the same search).

    Args:
        corners: (..., 8, 2).
    Returns:
        (w, h): each (...,).
    """
    diff = corners[..., :, None, :] - corners[..., None, :, :]  # (..., 8, 8, 2)
    batch = corners.shape[:-2]
    diff = diff.reshape(batch + (64, 2))
    norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    degenerate = norm < 1e-8
    safe = jnp.maximum(norm, 1e-8)[..., None]
    u = diff / safe  # (..., 64, 2) candidate x-axes
    # project corners on (u, u_perp): (..., 64, 8); HIGHEST so TPU doesn't
    # run the projections in bf16
    hi = jax.lax.Precision.HIGHEST
    px = jnp.einsum("...dc,...pc->...dp", u, corners, precision=hi)
    perp = jnp.stack([-u[..., 1], u[..., 0]], axis=-1)
    py = jnp.einsum("...dc,...pc->...dp", perp, corners, precision=hi)
    w = jnp.max(px, axis=-1) - jnp.min(px, axis=-1)
    h = jnp.max(py, axis=-1) - jnp.min(py, axis=-1)
    area = jnp.where(degenerate, jnp.inf, w * h)
    best = jnp.argmin(area, axis=-1)
    w_best = jnp.take_along_axis(w, best[..., None], axis=-1)[..., 0]
    h_best = jnp.take_along_axis(h, best[..., None], axis=-1)[..., 0]
    return w_best, h_best


def giou3d(boxes1, boxes2, eps=_EPS, enclosing: str = "smallest"):
    """Rotated 3D GIoU loss (reference ``cal_giou_3d``,
    oriented_iou_loss.py:112). Returns (giou_loss, iou).

    ``enclosing``: "smallest" (reference default, min-area rotated
    rectangle) or "aligned" (axis-aligned, cheaper upper bound).
    """
    bev1 = boxes1[..., jnp.array([0, 1, 3, 4, 6])]
    bev2 = boxes2[..., jnp.array([0, 1, 3, 4, 6])]
    c1 = bev_corners(bev1)
    c2 = bev_corners(bev2)
    inter2d = rotated_intersection_area_2d(c1, c2)
    area1 = bev1[..., 2] * bev1[..., 3]
    area2 = bev2[..., 2] * bev2[..., 3]
    union2d = area1 + area2 - inter2d

    zmax1 = boxes1[..., 2] + 0.5 * boxes1[..., 5]
    zmin1 = boxes1[..., 2] - 0.5 * boxes1[..., 5]
    zmax2 = boxes2[..., 2] + 0.5 * boxes2[..., 5]
    zmin2 = boxes2[..., 2] - 0.5 * boxes2[..., 5]
    z_overlap = jnp.clip(jnp.minimum(zmax1, zmax2) - jnp.maximum(zmin1, zmin2), 0.0)
    z_range = jnp.clip(jnp.maximum(zmax1, zmax2) - jnp.minimum(zmin1, zmin2), 0.0)

    inter3d = inter2d * z_overlap
    v1 = boxes1[..., 3] * boxes1[..., 4] * boxes1[..., 5]
    v2 = boxes2[..., 3] * boxes2[..., 4] * boxes2[..., 5]
    union3d = v1 + v2 - inter3d
    iou = inter3d / jnp.maximum(union3d, eps)

    all_c = jnp.concatenate([c1, c2], axis=-2)
    if enclosing == "smallest":
        w, h = _smallest_enclosing_wh(all_c)
    else:
        w = jnp.max(all_c[..., 0], axis=-1) - jnp.min(all_c[..., 0], axis=-1)
        h = jnp.max(all_c[..., 1], axis=-1) - jnp.min(all_c[..., 1], axis=-1)
    vc = jnp.maximum(z_range * w * h, eps)
    giou_loss = 1.0 - iou + (vc - union3d) / vc
    return giou_loss, iou
