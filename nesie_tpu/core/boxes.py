"""3D box geometry in the Depth (indoor / gravity-aligned) convention.

A box is a 7-vector ``(cx, cy, cz, sx, sy, sz, yaw)`` where ``(cx, cy, cz)``
is the *gravity center* unless a function says otherwise (the reference's
DepthInstance3DBoxes stores the *bottom* center; our decoded boxes and all
targets use gravity centers, matching how the reference's NesieHead builds
``bbox_targets`` from ``gravity_center`` — see reference
mmdet3d/models/dense_heads/nesie_head.py:676).

Rotation convention (matches reference DepthInstance3DBoxes, see reference
mmdet3d/core/bbox/structures/depth_box3d.py:51-89 and utils.py:21-62):
box-frame -> world is a *clockwise* rotation by ``yaw`` about +z:

    world_x = c * lx + s * ly
    world_y = -s * lx + c * ly        (c = cos(yaw), s = sin(yaw))

so world -> box-frame applies the counterclockwise matrix R(+yaw).

Everything here is pure jnp, differentiable where meaningful, and
shape-polymorphic over leading batch dims unless noted.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    """Wrap ``val`` into ``[-offset*period, (1-offset)*period)``."""
    return val - jnp.floor(val / period + offset) * period


def rotation_z(angle):
    """Box-frame -> world rotation matrices, shape ``angle.shape + (3, 3)``.

    Matches the reference's ``rotation_3d_in_axis(axis=2)`` as used for
    Depth-box corners (depth_box3d.py:87): a *clockwise* rotation by yaw
    when applied via ``rotate_points_z``.
    """
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    # applied as out_i = sum_j p_j R[j, i]:
    #   world_x = lx*c + ly*s ; world_y = -lx*s + ly*c   (clockwise by yaw)
    row0 = jnp.stack([c, -s, z], axis=-1)
    row1 = jnp.stack([s, c, z], axis=-1)
    row2 = jnp.stack([z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotate_points_z(points, angle):
    """Rotate local-frame points into world frame (clockwise by ``angle``).

    Args:
        points: (..., P, 3) points in the box frame.
        angle: (...,) yaw per box.
    Returns:
        (..., P, 3) rotated points.
    """
    rot = rotation_z(angle)  # (..., 3, 3)
    return jnp.einsum(
        "...pj,...ji->...pi", points, rot,
        precision=jax.lax.Precision.HIGHEST,
    )


_CORNER_SIGNS = jnp.array(
    # (x0y0z0, x0y0z1, x0y1z1, x0y1z0, x1y0z0, x1y0z1, x1y1z1, x1y1z0)
    # matching the reference corner ordering (depth_box3d.py:56).
    [
        [-0.5, -0.5, -0.5],
        [-0.5, -0.5, 0.5],
        [-0.5, 0.5, 0.5],
        [-0.5, 0.5, -0.5],
        [0.5, -0.5, -0.5],
        [0.5, -0.5, 0.5],
        [0.5, 0.5, 0.5],
        [0.5, 0.5, -0.5],
    ],
    dtype=jnp.float32,
)


def box_corners(boxes):
    """Corners of gravity-centered boxes.

    Args:
        boxes: (..., 7) ``(cx, cy, cz_gravity, sx, sy, sz, yaw)``.
    Returns:
        (..., 8, 3) corner coordinates (reference ordering).
    """
    dims = boxes[..., 3:6]
    local = _CORNER_SIGNS * dims[..., None, :]  # (..., 8, 3)
    world = rotate_points_z(local, boxes[..., 6])
    return world + boxes[..., None, :3]


def corners_minmax(corners):
    """(…, 8, 3) corners -> (…, 6) axis-aligned (min_xyz, max_xyz) box."""
    return jnp.concatenate(
        [jnp.min(corners, axis=-2), jnp.max(corners, axis=-2)], axis=-1
    )


def gravity_center_of(bottom_boxes):
    """Gravity centers of bottom-centered boxes (..., >=6)."""
    return jnp.stack(
        [
            bottom_boxes[..., 0],
            bottom_boxes[..., 1],
            bottom_boxes[..., 2] + 0.5 * bottom_boxes[..., 5],
        ],
        axis=-1,
    )


def box_to_surface(boxes):
    """Boxes -> 6 axis-aligned face coordinates ``(x1,y1,z1,x2,y2,z2)``.

    Mirrors the reference's ``Bbox2Surface`` (surface_loss.py:90): faces of
    the *axis-aligned* box around the (gravity) center, yaw ignored.
    """
    c = boxes[..., :3]
    s = boxes[..., 3:6]
    return jnp.concatenate([c - 0.5 * s, c + 0.5 * s], axis=-1)


def points_in_boxes(points, boxes, *, bottom_center: bool = True):
    """Which box every point falls into.

    Semantics match the reference CUDA ``points_in_boxes_batch`` reached via
    ``DepthInstance3DBoxes.points_in_boxes`` (depth_box3d.py:251 +
    roiaware_pool3d/src/points_in_boxes_cuda.cu:34-49): z test inclusive of
    the faces, xy test exclusive, offsets rotated counterclockwise by +yaw
    into the box frame.

    Args:
        points: (..., N, 3).
        boxes: (..., K, 7); ``cz`` is the *bottom* center when
            ``bottom_center=True`` (the raw dataset / reference convention),
            else the gravity center.
    Returns:
        (..., N, K) bool mask.
    """
    centers = boxes[..., :3]
    if bottom_center:
        centers = centers.at[..., 2].add(0.5 * boxes[..., 5])
    d = points[..., :, None, :3] - centers[..., None, :, :]  # (..., N, K, 3)
    yaw = boxes[..., 6]
    c = jnp.cos(yaw)[..., None, :]
    s = jnp.sin(yaw)[..., None, :]
    # world -> box frame: counterclockwise rotation by yaw.
    local_x = c * d[..., 0] - s * d[..., 1]
    local_y = s * d[..., 0] + c * d[..., 1]
    half = 0.5 * boxes[..., None, :, 3:6]
    in_x = jnp.abs(local_x) < half[..., 0]
    in_y = jnp.abs(local_y) < half[..., 1]
    in_z = jnp.abs(d[..., 2]) <= half[..., 2]
    return in_x & in_y & in_z
