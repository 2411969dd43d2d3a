"""Result visualization dumps (reference
mmdet3d/core/visualizer/show_result.py): write the scene points and
predicted/GT boxes as Wavefront ``.obj`` files viewable in MeshLab.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from nesie_tpu.core.boxes import box_corners

_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def write_points_obj(path, points, colors=None):
    """points (N, >=3) -> .obj vertex cloud."""
    with open(path, "w") as f:
        for i, p in enumerate(np.asarray(points)):
            if colors is not None:
                c = np.asarray(colors[i]) / 255.0
                f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {p[0]} {p[1]} {p[2]}\n")


def write_boxes_obj(path, boxes):
    """boxes (K, 7) gravity-centered -> wireframe .obj."""
    import jax.numpy as jnp

    corners = np.asarray(box_corners(jnp.asarray(boxes, jnp.float32)))
    with open(path, "w") as f:
        for box in corners:
            for c in box:
                f.write(f"v {c[0]} {c[1]} {c[2]}\n")
        for k in range(len(corners)):
            base = 1 + 8 * k
            for a, b in _BOX_EDGES:
                f.write(f"l {base + a} {base + b}\n")


def project_pts_on_img(points, raw_img, proj, max_distance: float = 70.0,
                       radius: int = 1):
    """Draw a point cloud onto an image, depth-colored (reference
    image_vis.py:8-56 ``project_pts_on_img``; returns the image instead of
    opening a cv2 window).

    Args:
        points: (N, >=3) 3D points.
        raw_img: (H, W, 3) uint8.
        proj: (4, 4) 3D->image projection (the reference's lidar2img_rt /
            depth2img matrix).
    """
    import cv2
    from matplotlib import cm

    img = np.ascontiguousarray(np.asarray(raw_img).copy())
    pts = np.asarray(points)[:, :3]
    pts_4d = np.concatenate([pts, np.ones((len(pts), 1))], axis=-1)
    pts_2d = pts_4d @ np.asarray(proj).T
    depth = np.clip(pts_2d[:, 2], 1e-5, None)
    u = pts_2d[:, 0] / depth
    v = pts_2d[:, 1] / depth
    fov = (u >= 0) & (u < img.shape[1]) & (v >= 0) & (v < img.shape[0])
    cmap = (cm.hsv(np.linspace(0, 1, 256))[:, :3] * 255)
    for ui, vi, di in zip(u[fov], v[fov], depth[fov]):
        color = cmap[int(np.clip(max_distance * 10 / di, 0, 255))]
        cv2.circle(img, (int(round(ui)), int(round(vi))), radius,
                   tuple(float(c) for c in color), -1)
    return img


def draw_bbox3d_on_img(boxes, raw_img, proj, color=(0, 255, 0),
                       thickness: int = 1):
    """Project (K, 7) gravity-centered boxes and draw their wireframes
    (reference image_vis.py:59-121 ``plot_rect3d_on_img`` +
    ``draw_lidar_bbox3d_on_img``)."""
    import cv2

    import jax.numpy as jnp

    img = np.ascontiguousarray(np.asarray(raw_img).copy())
    corners = np.asarray(box_corners(jnp.asarray(boxes, jnp.float32)))
    k = corners.shape[0]
    pts_4d = np.concatenate(
        [corners.reshape(-1, 3), np.ones((k * 8, 1))], axis=-1
    )
    pts_2d = pts_4d @ np.asarray(proj).T
    depth = np.clip(pts_2d[:, 2], 1e-5, None)
    uv = (pts_2d[:, :2] / depth[:, None]).reshape(k, 8, 2)
    for box_uv in uv.astype(np.int64):
        for a, b in _BOX_EDGES:
            cv2.line(img, tuple(box_uv[a]), tuple(box_uv[b]), color,
                     thickness, cv2.LINE_AA)
    return img


def show_result(out_dir, name, points=None, gt_boxes=None, pred_boxes=None):
    """Dump <name>_points.obj / _gt.obj / _pred.obj into out_dir."""
    out = Path(out_dir) / name
    out.mkdir(parents=True, exist_ok=True)
    if points is not None:
        write_points_obj(out / f"{name}_points.obj", points)
    if gt_boxes is not None and len(gt_boxes):
        write_boxes_obj(out / f"{name}_gt.obj", gt_boxes)
    if pred_boxes is not None and len(pred_boxes):
        write_boxes_obj(out / f"{name}_pred.obj", pred_boxes)
    return out
