"""Coordinate-mode conversions between Depth / LiDAR / Camera box frames
(reference mmdet3d/core/bbox/structures/box_3d_mode.py +
coord_3d_mode.py). Boxes are plain (..., 7) arrays.

Conventions (reference box_3d_mode.py:85-131):
  DEPTH -> LIDAR: p' = (y, -x, z);      sizes (sy, sx, sz); yaw unchanged
  LIDAR -> DEPTH: p' = (-y, x, z);      sizes (sy, sx, sz); yaw unchanged
  DEPTH -> CAM:   p' = (x, z, -y);      sizes (sx, sz, sy); yaw unchanged
  CAM  -> DEPTH:  p' = (x, -z, y);      sizes (sx, sz, sy); yaw unchanged
  LIDAR -> CAM:   p' = (-y, -z, x);     sizes (sy, sz, sx); yaw unchanged
  CAM  -> LIDAR:  p' = (z, -x, -y);     sizes (sz, sx, sy); yaw unchanged

Two audited reference quirks preserved verbatim (both oracle-tested in
tests/test_reference_oracle2.py against Box3DMode.convert itself):
* the direct LIDAR<->CAM matrices are NOT the composition through DEPTH
  (the compositions differ in two axis signs);
* DEPTH<->CAM for *boxes* (box_3d_mode.py:112-118) is the inverse of
  DEPTH<->CAM for *points* (coord_3d_mode.py:228-234; see
  ``convert_points`` below, which follows the points convention).
"""
from __future__ import annotations

import jax.numpy as jnp


def _swap(b, perm, signs):
    xyz = jnp.stack(
        [signs[i] * b[..., perm[i]] for i in range(3)], axis=-1
    )
    size_perm = [p + 3 for p in perm]
    size = jnp.stack([b[..., size_perm[i]] for i in range(3)], axis=-1)
    return jnp.concatenate([xyz, size, b[..., 6:7]], axis=-1)


def depth_to_lidar(boxes):
    return _swap(boxes, (1, 0, 2), (1.0, -1.0, 1.0))


def lidar_to_depth(boxes):
    return _swap(boxes, (1, 0, 2), (-1.0, 1.0, 1.0))


def depth_to_cam(boxes):
    return _swap(boxes, (0, 2, 1), (1.0, 1.0, -1.0))


def cam_to_depth(boxes):
    return _swap(boxes, (0, 2, 1), (1.0, -1.0, 1.0))


def lidar_to_cam(boxes):
    return _swap(boxes, (1, 2, 0), (-1.0, -1.0, 1.0))


def cam_to_lidar(boxes):
    return _swap(boxes, (2, 0, 1), (1.0, -1.0, -1.0))


def convert_points(points, src: str, dst: str):
    """Convert (..., >=3) point xyz between frames (Coord3DMode.convert)."""
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    key = (src.upper(), dst.upper())
    if key == ("DEPTH", "LIDAR"):
        out = jnp.stack([y, -x, z], axis=-1)
    elif key == ("LIDAR", "DEPTH"):
        out = jnp.stack([-y, x, z], axis=-1)
    elif key == ("DEPTH", "CAM"):
        out = jnp.stack([x, -z, y], axis=-1)
    elif key == ("CAM", "DEPTH"):
        out = jnp.stack([x, z, -y], axis=-1)
    elif key == ("LIDAR", "CAM"):
        out = jnp.stack([-y, -z, x], axis=-1)
    elif key == ("CAM", "LIDAR"):
        out = jnp.stack([z, -x, -y], axis=-1)
    elif src.upper() == dst.upper():
        out = points[..., :3]
    else:
        raise ValueError(f"unsupported conversion {src}->{dst}")
    if points.shape[-1] > 3:
        out = jnp.concatenate([out, points[..., 3:]], axis=-1)
    return out
