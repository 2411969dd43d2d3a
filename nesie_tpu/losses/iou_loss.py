"""Rotated / axis-aligned IoU losses (reference
mmdet3d/models/losses/iou3d_loss.py)."""
from __future__ import annotations

import jax.numpy as jnp

from nesie_tpu.core.iou import axis_aligned_iou_3d, iou3d


def iou_3d_loss(pred, target):
    """1 - rotated IoU, unreduced.

    Args:
        pred, target: (..., 7) gravity-centered boxes.
    Returns:
        (...,) loss.
    """
    return 1.0 - iou3d(pred, target)


def axis_aligned_iou_loss(pred, target):
    """1 - axis-aligned IoU of center-size boxes, unreduced."""
    return 1.0 - axis_aligned_iou_3d(pred, target, aligned=True)
