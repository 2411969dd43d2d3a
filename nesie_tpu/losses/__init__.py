from .basic import (
    mse_loss,
    smooth_l1_loss,
    l1_loss,
    softmax_cross_entropy,
    weight_reduce,
    weighted_smooth_l1,
    corner_loss_lidar,
)
from .chamfer import chamfer_distance
from .gfocal import quality_focal_loss, distribution_focal_loss
from .surface import (
    bbox_to_surface,
    surface_loss_mse,
    surface_loss_smooth_l1,
    surface_loss_ce,
    transform_surface,
    surface_to_prob,
)
from .side_pred import side_pred_loss
from .iou_loss import iou_3d_loss, axis_aligned_iou_loss

__all__ = [
    "mse_loss",
    "smooth_l1_loss",
    "l1_loss",
    "softmax_cross_entropy",
    "weight_reduce",
    "chamfer_distance",
    "quality_focal_loss",
    "distribution_focal_loss",
    "bbox_to_surface",
    "surface_loss_mse",
    "surface_loss_smooth_l1",
    "surface_loss_ce",
    "transform_surface",
    "surface_to_prob",
    "side_pred_loss",
    "iou_3d_loss",
    "axis_aligned_iou_loss",
    "weighted_smooth_l1",
    "corner_loss_lidar",
]
