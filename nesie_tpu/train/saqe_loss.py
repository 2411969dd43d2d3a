"""SAQE losses — pure-function ports of reference SAQEHead.loss
(pretrain, saqe_head.py:331-521), sup_loss (semi labeled, :524-705) and
unsup_loss (:706-800).

Key structural differences from the Nesie losses:
  * objectness supervises the extra R_obj branches (main + jitter, x0.5);
  * angle losses: SmoothL1 on sin/cos (x10) + MSE self-distilled angle
    quality on rotate_scores (x1), with the reference's
    ``/ box_loss_weights.max()`` label normalization (saqe_head.py:427);
  * pretrain applies NO sigma attenuation; the semi-phase sup_loss applies
    ``exp(-sigma.detach())`` with no ``+ alpha * sigma`` regularizer;
  * side loss also supervises the jittered side scores against the
    jittered surfaces.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nesie_tpu.core.iou import iou3d
from nesie_tpu.losses import (
    iou_3d_loss,
    mse_loss,
    quality_focal_loss,
    side_pred_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    surface_loss_mse,
)
from .sup_loss import NesieLossConfig, center_loss_fn, sigma_poly, vote_loss_fn
from .targets import HeadTargets


@dataclass(frozen=True)
class SAQELossConfig(NesieLossConfig):
    angle_weight: float = 10.0
    angle_beta: float = 1.0
    angle_pred_weight: float = 1.0


def _side_at(side_scores, cls_idx, flat, C):
    side = side_scores.reshape(flat, 6, C)
    return jnp.take_along_axis(side, cls_idx[:, None, None], axis=2)[..., 0]


def saqe_supervised_loss(
    results,
    targets: HeadTargets,
    cfg: SAQELossConfig = SAQELossConfig(),
    phase: str = "pretrain",
):
    """phase: "pretrain" (no attenuation) or "semi" (detached sigma)."""
    C = cfg.num_classes
    B, P = results["obj_scores"].shape[:2]
    flat = B * P

    losses = {}
    losses["vote_loss"] = vote_loss_fn(results, targets, cfg)

    def obj_ce(scores):
        ce = softmax_cross_entropy(
            scores, targets.objectness_targets,
            class_weight=cfg.objectness_class_weight,
        )
        return cfg.objectness_weight * jnp.sum(ce * targets.objectness_weights)

    losses["objectness_loss"] = obj_ce(results["obj_scores"]) + 0.5 * (
        obj_ce(results["R_obj_scores"]) + obj_ce(results["R_obj_scores_jitter"])
    )

    losses["center_loss"] = center_loss_fn(results, targets, cfg)

    bbox_targets = targets.bbox_targets.reshape(flat, -1)
    surface_pred = results["surface_pred"].reshape(flat, 6)
    surface_weight = jnp.repeat(
        targets.box_loss_weights.reshape(flat)[:, None], 6, axis=1
    )
    raw_surface = (
        cfg.surface_weight
        * surface_loss_mse(surface_pred, bbox_targets)
        * surface_weight
    )

    sem_argmax = jnp.argmax(results["sem_scores"], axis=-1).reshape(flat)
    side_at_argmax = _side_at(results["side_scores"], sem_argmax, flat, C)
    sigma = jax.lax.stop_gradient(sigma_poly(side_at_argmax))
    sigma_mean = jnp.mean(sigma, axis=-1)

    if phase == "semi":
        losses["surface_loss"] = jnp.sum(jnp.exp(-sigma) * raw_surface)
    else:
        losses["surface_loss"] = jnp.sum(raw_surface)

    # ---- angle losses ----
    w = targets.box_loss_weights.reshape(flat)
    pred_angle = results["bbox_preds"][..., 6].reshape(flat)
    target_angle = bbox_targets[..., 6]
    sin_l = smooth_l1_loss(jnp.sin(pred_angle), jnp.sin(target_angle), cfg.angle_beta)
    cos_l = smooth_l1_loss(jnp.cos(pred_angle), jnp.cos(target_angle), cfg.angle_beta)
    angle_elem = cfg.angle_weight * (sin_l + cos_l) * w
    rot_at = jnp.take_along_axis(
        results["rotate_scores"].reshape(flat, C), sem_argmax[:, None], axis=1
    )[:, 0]
    if phase == "semi":
        angle_sigma = jax.lax.stop_gradient(sigma_poly(rot_at))
        losses["angle_loss"] = jnp.sum(jnp.exp(-angle_sigma) * angle_elem)
    else:
        losses["angle_loss"] = jnp.sum(angle_elem)

    # self-distilled angle quality (label normalized by max box weight,
    # saqe_head.py:427) — PRETRAIN ONLY: the semi-phase sup_loss
    # (saqe_head.py:524-705) computes the angle sigma but never trains
    # rotate_scores (no angle_pred term in its return dict).
    if phase != "semi":
        angle_label = jax.lax.stop_gradient(
            angle_elem / jnp.maximum(jnp.max(targets.box_loss_weights), 1e-12)
        )
        rot_j_at = jnp.take_along_axis(
            results["rotate_scores_jitter"].reshape(flat, C),
            sem_argmax[:, None], axis=1
        )[:, 0]
        losses["angle_pred_loss"] = cfg.angle_pred_weight * (
            jnp.sum(mse_loss(rot_at, angle_label) * w)
            + jnp.sum(mse_loss(rot_j_at, angle_label) * w)
        )

    sem_ce = softmax_cross_entropy(results["sem_scores"], targets.mask_targets)
    losses["semantic_loss"] = cfg.semantic_weight * jnp.sum(
        sem_ce * targets.box_loss_weights
    )

    bbox_pred_flat = results["bbox_preds"].reshape(flat, 7)
    raw_iou = cfg.iou_weight * iou_3d_loss(bbox_pred_flat, bbox_targets) * w
    if phase == "semi":
        losses["iou_loss"] = jnp.sum(jnp.exp(-sigma_mean) * raw_iou)
    else:
        losses["iou_loss"] = jnp.sum(raw_iou)

    label_cls = targets.mask_targets.reshape(flat)
    label_iou = jax.lax.stop_gradient(iou3d(bbox_pred_flat, bbox_targets))
    jitter_flat = results["jitter_bbox_preds"].reshape(flat, 7)
    label_iou_j = jax.lax.stop_gradient(iou3d(jitter_flat, bbox_targets))
    losses["iou_pred_loss"] = cfg.iou_pred_weight * (
        jnp.sum(
            quality_focal_loss(
                results["iou_scores"].reshape(flat, C), label_cls, label_iou,
                beta=cfg.iou_pred_beta, use_sigmoid=False,
            )
            * w
        )
        + jnp.sum(
            quality_focal_loss(
                results["iou_scores_jitter"].reshape(flat, C), label_cls,
                label_iou_j, beta=cfg.iou_pred_beta, use_sigmoid=False,
            )
            * w
        )
    )

    side_at_label = _side_at(results["side_scores"], label_cls, flat, C)
    side_main = jnp.sum(
        side_pred_loss(
            side_at_label,
            jax.lax.stop_gradient(surface_pred),
            bbox_targets,
            weight=surface_weight,
        )
    )
    side_j_at_label = _side_at(results["side_scores_jitter"], label_cls, flat, C)
    side_jit = jnp.sum(
        side_pred_loss(
            side_j_at_label,
            jax.lax.stop_gradient(
                results["jitter_surface_preds"].reshape(flat, 6)
            ),
            bbox_targets,
            weight=surface_weight,
        )
    )
    losses["side_loss"] = cfg.side_weight * (side_main + side_jit)

    total = sum(losses.values())
    return total, losses


def saqe_unsup_loss(
    results,
    targets: HeadTargets,
    pseudo_quality,
    cfg: SAQELossConfig = SAQELossConfig(),
    un_label_weight: float = 2.0,
):
    """SAQE unsupervised losses (saqe_head.py:706-800): like Nesie's but
    with detached sigma and no +alpha*sigma regularizer."""
    C = cfg.num_classes
    B, P = results["obj_scores"].shape[:2]
    flat = B * P

    quality_side = jnp.take_along_axis(
        pseudo_quality, targets.assignment[..., None], axis=1
    )
    quality_mean = jnp.mean(quality_side, axis=-1)

    losses = {}
    losses["unsup_center_loss"] = center_loss_fn(results, targets, cfg)

    sem_ce = softmax_cross_entropy(results["sem_scores"], targets.mask_targets)
    losses["unsup_semantic_loss"] = cfg.semantic_weight * jnp.sum(
        sem_ce * targets.box_loss_weights
    )

    sem_argmax = jnp.argmax(results["sem_scores"], axis=-1).reshape(flat)
    side_at = _side_at(results["side_scores"], sem_argmax, flat, C)
    sigma = jax.lax.stop_gradient(sigma_poly(side_at))
    sigma_mean = jnp.mean(sigma, axis=-1)

    bbox_targets = targets.bbox_targets.reshape(flat, -1)
    iou_weight = (targets.box_loss_weights * quality_mean).reshape(flat)
    raw_iou = (
        cfg.iou_weight
        * iou_3d_loss(results["bbox_preds"].reshape(flat, 7), bbox_targets)
        * iou_weight
    )
    losses["unsup_iou_loss"] = jnp.sum(jnp.exp(-sigma_mean) * raw_iou)

    surface_weight = (
        jnp.repeat(targets.box_loss_weights.reshape(flat)[:, None], 6, axis=1)
        * quality_side.reshape(flat, 6)
    )
    raw_surface = (
        cfg.surface_weight
        * surface_loss_mse(results["surface_pred"].reshape(flat, 6), bbox_targets)
        * surface_weight
    )
    losses["unsup_surface_loss"] = jnp.sum(jnp.exp(-sigma) * raw_surface)

    losses = {k: un_label_weight * v for k, v in losses.items()}
    return sum(losses.values()), losses
