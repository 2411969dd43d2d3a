from .boxes import (
    box_corners,
    box_to_surface,
    gravity_center_of,
    points_in_boxes,
    rotation_z,
    rotate_points_z,
    corners_minmax,
    limit_period,
)
from .iou import axis_aligned_iou_3d, axis_aligned_overlap_3d, iou3d, giou3d, iou_bev
from .nms import aligned_3d_nms_mask

__all__ = [
    "box_corners",
    "box_to_surface",
    "gravity_center_of",
    "points_in_boxes",
    "rotation_z",
    "rotate_points_z",
    "corners_minmax",
    "limit_period",
    "axis_aligned_iou_3d",
    "axis_aligned_overlap_3d",
    "iou3d",
    "giou3d",
    "iou_bev",
    "aligned_3d_nms_mask",
]
