"""NumPy box math (reference mmdet3d/core/bbox/box_np_ops.py — the host
-side helpers used by data prep and offline tooling)."""
from __future__ import annotations

import numpy as np


def rotation_points_single_angle(points, angle, axis: int = 2):
    """Rotate (N, 3) points about one axis (box_np_ops semantics: clockwise
    for axis=2 with the depth convention, matching rotation_3d_in_axis)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis == 2:
        # applied as points @ rot: world = clockwise-by-angle (matches
        # core.boxes.rotate_points_z)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    elif axis == 1:
        rot = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])
    else:
        rot = np.array([[1, 0, 0], [0, c, s], [0, -s, c]])
    return points @ rot


def center_to_corner_box3d(centers, dims, angles, origin=(0.5, 0.5, 0.5)):
    """(N, 3) centers + (N, 3) dims + (N,) yaw -> (N, 8, 3) corners."""
    signs = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(8, 3)[[0, 1, 3, 2, 4, 5, 7, 6]]
    local = (signs - np.asarray(origin)) * dims[:, None, :]
    out = np.empty((len(centers), 8, 3))
    for i in range(len(centers)):
        out[i] = rotation_points_single_angle(local[i], angles[i]) + centers[i]
    return out


def corner_to_standup_nd(corners):
    """(N, 8, 3) corners -> (N, 6) axis-aligned minmax boxes."""
    return np.concatenate([corners.min(1), corners.max(1)], axis=1)


def points_in_rbbox(points, boxes, origin=(0.5, 0.5, 0)):
    """(N, >=3) points x (K, 7) boxes -> (N, K) bool (numpy mirror of
    core.boxes.points_in_boxes; z faces inclusive, xy exclusive)."""
    centers = boxes[:, :3].copy()
    if origin[2] == 0:  # bottom-centered input
        centers[:, 2] += boxes[:, 5] / 2
    d = points[:, None, :3] - centers[None]
    c = np.cos(boxes[:, 6])[None]
    s = np.sin(boxes[:, 6])[None]
    lx = c * d[..., 0] - s * d[..., 1]
    ly = s * d[..., 0] + c * d[..., 1]
    half = boxes[None, :, 3:6] / 2
    return (
        (np.abs(lx) < half[..., 0])
        & (np.abs(ly) < half[..., 1])
        & (np.abs(d[..., 2]) <= half[..., 2])
    )


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    return val - np.floor(val / period + offset) * period


def box_collision_test(boxes_a, boxes_b):
    """(N, 6) x (M, 6) axis-aligned minmax BEV collision matrix (the
    dbsampler's overlap check)."""
    ax0, ay0, ax1, ay1 = boxes_a[:, 0], boxes_a[:, 1], boxes_a[:, 3], boxes_a[:, 4]
    bx0, by0, bx1, by1 = boxes_b[:, 0], boxes_b[:, 1], boxes_b[:, 3], boxes_b[:, 4]
    ix = np.minimum(ax1[:, None], bx1[None]) - np.maximum(ax0[:, None], bx0[None])
    iy = np.minimum(ay1[:, None], by1[None]) - np.maximum(ay0[:, None], by0[None])
    return (ix > 0) & (iy > 0)
