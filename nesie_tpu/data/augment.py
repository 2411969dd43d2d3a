"""Jit-able geometric augmentations with an explicit parameter record.

Replaces the reference's RandomFlip3D / GlobalRotScaleTrans pipeline stages
(transforms_3d.py:59,497) and the img_metas ``transformation_3d_flow``
replay used for teacher->student pseudo-box reprojection
(votenet_nesie.py:595-634). Each sample's augmentation is a pure function
of an ``AugParams`` pytree, so the inverse/forward replay is a vectorized
device op instead of per-sample host box mutation.

Operation order matches the reference pipelines: flips first (H then V),
then rotate -> scale -> translate.

Conventions (reference DepthInstance3DBoxes):
  * horizontal flip: x -> -x, yaw -> pi - yaw     (depth_box3d.py:190-193)
  * vertical flip:   y -> -y, yaw -> -yaw          (depth_box3d.py:194-197)
  * rotate by angle a (counterclockwise for points): box yaw -> yaw - a
    (depth_box3d.py:150-152)
  * scale s: centers, sizes and point coords all * s
  * translate t: centers / points + t

Boxes here are (..., 7) with *bottom-centered* z (dataset convention);
all ops are z-translation/scale safe for that convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugParams(NamedTuple):
    """Per-sample augmentation record. Leading dims broadcast over boxes."""

    flip_h: jnp.ndarray   # (...,) bool/float
    flip_v: jnp.ndarray   # (...,)
    rot: jnp.ndarray      # (...,) radians
    scale: jnp.ndarray    # (...,)
    trans: jnp.ndarray    # (..., 3)

    @staticmethod
    def identity(batch_shape=()):
        z = jnp.zeros(batch_shape)
        return AugParams(
            flip_h=jnp.zeros(batch_shape, bool),
            flip_v=jnp.zeros(batch_shape, bool),
            rot=z,
            scale=jnp.ones(batch_shape),
            trans=jnp.zeros(batch_shape + (3,)),
        )

    @staticmethod
    def sample(
        rng,
        batch_shape=(),
        flip_ratio_h: float = 0.5,
        flip_ratio_v: float = 0.5,
        rot_range: float = jnp.pi / 36,
        scale_range: tuple = (0.85, 1.15),
        translation_std: float = 0.1,
    ):
        """Random params matching the strong train pipeline
        (configs/Nesie/...train-010.py:198-208)."""
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        return AugParams(
            flip_h=jax.random.uniform(k1, batch_shape) < flip_ratio_h,
            flip_v=jax.random.uniform(k2, batch_shape) < flip_ratio_v,
            rot=jax.random.uniform(
                k3, batch_shape, minval=-rot_range, maxval=rot_range
            ),
            scale=jax.random.uniform(
                k4, batch_shape, minval=scale_range[0], maxval=scale_range[1]
            ),
            trans=jax.random.normal(k5, batch_shape + (3,)) * translation_std,
        )


def _rot_xy(x, y, angle):
    """Counterclockwise rotation of world points (reference
    BasePoints.rotate / box center rotation, depth_box3d.py:150)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    return x * c - y * s, x * s + y * c


def augment_points(points, aug: AugParams, *, shift_height: bool = False):
    """Apply flips/R/S/T to (..., N, C>=3) points (xyz first).

    When ``shift_height``, the 4th channel is the height feature and is
    scaled along with the cloud (reference GlobalRotScaleTrans with
    shift_height=True scales the height dim too, transforms_3d.py:497+).
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    fh, fv, rot, scale, trans = aug.flip_h, aug.flip_v, aug.rot, aug.scale, aug.trans
    while fh.ndim < x.ndim:
        fh, fv, rot, scale = fh[..., None], fv[..., None], rot[..., None], scale[..., None]
        trans = trans[..., None, :]
    x = jnp.where(fh, -x, x)
    y = jnp.where(fv, -y, y)
    x, y = _rot_xy(x, y, rot)
    x = x * scale + trans[..., 0]
    y = y * scale + trans[..., 1]
    z = z * scale + trans[..., 2]
    xyz = jnp.stack([x, y, z], axis=-1)
    if points.shape[-1] > 3:
        rest = points[..., 3:]
        if shift_height:
            rest = rest.at[..., 0].multiply(scale)
        return jnp.concatenate([xyz, rest], axis=-1)
    return xyz


def augment_boxes(boxes, aug: AugParams):
    """Apply flips/R/S/T to (..., K, 7) bottom-centered boxes."""
    cx, cy, cz = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    size = boxes[..., 3:6]
    yaw = boxes[..., 6]

    fh, fv, rot, scale, trans = aug.flip_h, aug.flip_v, aug.rot, aug.scale, aug.trans
    while fh.ndim < cx.ndim:
        fh, fv, rot, scale = fh[..., None], fv[..., None], rot[..., None], scale[..., None]
        trans = trans[..., None, :]

    cx = jnp.where(fh, -cx, cx)
    yaw = jnp.where(fh, jnp.pi - yaw, yaw)
    cy = jnp.where(fv, -cy, cy)
    yaw = jnp.where(fv, -yaw, yaw)

    cx, cy = _rot_xy(cx, cy, rot)
    yaw = yaw - rot

    cx = cx * scale + trans[..., 0]
    cy = cy * scale + trans[..., 1]
    cz = cz * scale + trans[..., 2]
    size = size * scale[..., None]
    return jnp.concatenate(
        [jnp.stack([cx, cy, cz], -1), size, yaw[..., None]], axis=-1
    )


def unaugment_boxes(boxes, aug: AugParams):
    """Inverse of ``augment_boxes`` (ops reversed: T^-1, S^-1, R^-1, VF, HF)."""
    cx, cy, cz = boxes[..., 0], boxes[..., 1], boxes[..., 2]
    size = boxes[..., 3:6]
    yaw = boxes[..., 6]

    fh, fv, rot, scale, trans = aug.flip_h, aug.flip_v, aug.rot, aug.scale, aug.trans
    while fh.ndim < cx.ndim:
        fh, fv, rot, scale = fh[..., None], fv[..., None], rot[..., None], scale[..., None]
        trans = trans[..., None, :]

    cx = (cx - trans[..., 0]) / scale
    cy = (cy - trans[..., 1]) / scale
    cz = (cz - trans[..., 2]) / scale
    size = size / scale[..., None]

    cx, cy = _rot_xy(cx, cy, -rot)
    yaw = yaw + rot

    cy = jnp.where(fv, -cy, cy)
    yaw = jnp.where(fv, -yaw, yaw)
    cx = jnp.where(fh, -cx, cx)
    yaw = jnp.where(fh, jnp.pi - yaw, yaw)
    return jnp.concatenate(
        [jnp.stack([cx, cy, cz], -1), size, yaw[..., None]], axis=-1
    )


def reproject_boxes(boxes, src_aug: AugParams, dst_aug: AugParams):
    """Teacher-frame -> student-frame pseudo-box reprojection
    (reference transformation_bbox_preds, votenet_nesie.py:310)."""
    return augment_boxes(unaugment_boxes(boxes, src_aug), dst_aug)
