"""Self-distilled side-quality prediction loss (reference
mmdet3d/models/losses/side_pred_loss.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .basic import l1_loss, mse_loss, smooth_l1_loss
from .surface import bbox_to_surface


def side_pred_loss(
    pred_side,
    pred_surface,
    target_bbox,
    weight=None,
    label_scale: float = 4.0,
    beta: float = 5.0,
    label_func: str = "l1",
    loss_func: str = "mse",
):
    """Label = clipped (scaled) surface-regression error; loss = MSE of the
    predicted side score against it (side_pred_loss.py:64-82).

    With the shipped config: label_func_type='SmoothL1Loss' maps to an
    L1Loss with loss_weight 4.0 in the reference (side_pred_loss.py:31 —
    their own naming quirk, preserved here via label_func='l1').

    Args:
        pred_side: (N, 6) side scores; pred_surface: (N, 6);
        target_bbox: (N, >=6).
    Returns:
        (N, 6) unreduced loss (caller multiplies weight and sums).
    """
    target = bbox_to_surface(target_bbox)
    if label_func == "l1":
        label = label_scale * l1_loss(pred_surface, target)
    else:
        label = label_scale * mse_loss(pred_surface, target)
    label = jax.lax.stop_gradient(jnp.minimum(label, 1.0))
    if loss_func == "mse":
        loss = mse_loss(pred_side, label)
    else:
        loss = smooth_l1_loss(pred_side, label, beta)
    if weight is not None:
        loss = loss * weight
    return loss
