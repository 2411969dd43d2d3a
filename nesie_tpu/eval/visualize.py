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
