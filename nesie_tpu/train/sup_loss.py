"""Supervised Nesie loss — pure-function port of reference
NesieHead.loss (nesie_head.py:277-412) + VoteModule.get_loss
(vote_module.py:149).

All reductions, weights and the sigma-attenuation polynomial follow the
reference exactly; shapes are the channels-last results-dict of
nesie_tpu.nn.NesieHead plus HeadTargets.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from nesie_tpu.losses import (
    iou_3d_loss,
    l1_loss,
    mse_loss,
    quality_focal_loss,
    side_pred_loss,
    softmax_cross_entropy,
    surface_loss_mse,
)
from .targets import HeadTargets


@dataclass(frozen=True)
class NesieLossConfig:
    num_classes: int = 18
    alpha: float = 1.0
    vote_dst_weight: float = 10.0
    objectness_weight: float = 5.0
    objectness_class_weight: tuple = (0.2, 0.8)
    center_src_weight: float = 10.0
    center_dst_weight: float = 10.0
    surface_weight: float = 10.0
    semantic_weight: float = 1.0
    iou_weight: float = 3.0
    iou_pred_weight: float = 1.0
    iou_pred_beta: float = 2.0
    side_weight: float = 1.0
    gt_per_seed: int = 3


def sigma_poly(side_scores):
    """sigma(s) = 0.8 s^2 - 1.8 s + 1 (nesie_head.py:347)."""
    return 0.8 * side_scores * side_scores - 1.8 * side_scores + 1.0


def vote_loss_fn(results, targets: HeadTargets, cfg: NesieLossConfig):
    """Min-over-GT-votes L1 chamfer (vote_module.py:149-180)."""
    seed_idx = results["seed_indices"].astype(jnp.int32)  # (B, S)
    mask = jnp.take_along_axis(targets.vote_target_masks, seed_idx, axis=1)
    mask = mask.astype(jnp.float32)  # (B, S)
    g = cfg.gt_per_seed
    vt = jnp.take_along_axis(
        targets.vote_targets, seed_idx[..., None], axis=1
    )  # (B, S, 3g)
    B, S = seed_idx.shape
    seed_rep = jnp.tile(results["seed_points"], (1, 1, g))
    gt_votes = (vt + seed_rep).reshape(B, S, g, 3)
    vote = results["vote_points"][:, :, None, :]  # (B, S, 1, 3)
    dist = jnp.sum(l1_loss(vote, gt_votes), axis=-1)  # (B, S, g)
    weight = mask / (jnp.sum(mask) + 1e-6)
    dist = dist * weight[..., None] * cfg.vote_dst_weight
    return jnp.sum(jnp.min(dist, axis=-1))


def center_loss_fn(results, targets: HeadTargets, cfg: NesieLossConfig):
    """Bidirectional L2 chamfer between proposal centers and (padded)
    GT centers — padded zero-centers intentionally participate in the
    proposal->GT min, as in the reference (see targets.py docstring)."""
    src = results["bbox_preds"][..., :3]
    dst = targets.center_targets
    d = jnp.sum(mse_loss(src[:, :, None], dst[:, None]), axis=-1)  # (B, P, M)
    s2d = jnp.min(d, axis=2) * targets.box_loss_weights * cfg.center_src_weight
    d2s = jnp.min(d, axis=1) * targets.valid_gt_weights * cfg.center_dst_weight
    return jnp.sum(s2d) + jnp.sum(d2s)


def nesie_supervised_loss(results, targets: HeadTargets,
                          cfg: NesieLossConfig = NesieLossConfig()):
    """Returns (total_loss, dict of scalar terms)."""
    C = cfg.num_classes
    B, P = results["obj_scores"].shape[:2]
    flat = B * P

    losses = {}
    losses["vote_loss"] = vote_loss_fn(results, targets, cfg)

    obj_ce = softmax_cross_entropy(
        results["obj_scores"],
        targets.objectness_targets,
        class_weight=cfg.objectness_class_weight,
    )
    losses["objectness_loss"] = cfg.objectness_weight * jnp.sum(
        obj_ce * targets.objectness_weights
    )

    losses["center_loss"] = center_loss_fn(results, targets, cfg)

    # ---- surface loss with sigma attenuation ----
    bbox_targets = targets.bbox_targets.reshape(flat, -1)
    surface_pred = results["surface_pred"].reshape(flat, 6)
    surface_weight = jnp.repeat(
        targets.box_loss_weights.reshape(flat)[:, None], 6, axis=1
    )
    raw_surface = (
        cfg.surface_weight
        * surface_loss_mse(surface_pred, bbox_targets)
        * surface_weight
    )  # (flat, 6)

    sem_argmax = jnp.argmax(results["sem_scores"], axis=-1).reshape(flat)
    side_all = results["side_scores"].reshape(flat, 6, C)
    side_at_argmax = jnp.take_along_axis(
        side_all, sem_argmax[:, None, None], axis=2
    )[..., 0]  # (flat, 6)
    sigma = sigma_poly(side_at_argmax)
    losses["surface_loss"] = jnp.sum(
        jnp.exp(-sigma) * raw_surface + cfg.alpha * sigma * surface_weight
    )

    # ---- semantic ----
    sem_ce = softmax_cross_entropy(results["sem_scores"], targets.mask_targets)
    losses["semantic_loss"] = cfg.semantic_weight * jnp.sum(
        sem_ce * targets.box_loss_weights
    )

    # ---- rotated IoU loss with sigma-mean attenuation ----
    iou_weight = targets.box_loss_weights.reshape(flat)
    bbox_pred_flat = results["bbox_preds"].reshape(flat, 7)
    raw_iou = cfg.iou_weight * iou_3d_loss(bbox_pred_flat, bbox_targets) * iou_weight
    sigma_mean = jnp.mean(sigma, axis=-1)
    losses["iou_loss"] = jnp.sum(
        jnp.exp(-sigma_mean) * raw_iou + cfg.alpha * sigma_mean * iou_weight
    )

    # ---- IoU-prediction QFL on main + jittered proposals ----
    from nesie_tpu.core.iou import iou3d  # local import to avoid cycle

    label_cls = targets.mask_targets.reshape(flat)
    label_iou = jax.lax.stop_gradient(iou3d(bbox_pred_flat, bbox_targets))
    jitter_flat = results["jitter_bbox_preds"].reshape(flat, 7)
    label_iou_j = jax.lax.stop_gradient(iou3d(jitter_flat, bbox_targets))

    qfl_main = quality_focal_loss(
        results["iou_scores"].reshape(flat, C), label_cls, label_iou,
        beta=cfg.iou_pred_beta, use_sigmoid=False,
    )
    qfl_jitter = quality_focal_loss(
        results["iou_scores_jitter"].reshape(flat, C), label_cls, label_iou_j,
        beta=cfg.iou_pred_beta, use_sigmoid=False,
    )
    losses["iou_pred_loss"] = cfg.iou_pred_weight * (
        jnp.sum(qfl_main * iou_weight) + jnp.sum(qfl_jitter * iou_weight)
    )

    # ---- side prediction loss (self-distilled) ----
    side_at_label = jnp.take_along_axis(
        side_all, label_cls[:, None, None], axis=2
    )[..., 0]  # (flat, 6)
    losses["side_loss"] = cfg.side_weight * jnp.sum(
        side_pred_loss(
            side_at_label,
            jax.lax.stop_gradient(surface_pred),
            bbox_targets,
            weight=surface_weight,
        )
    )

    total = sum(losses.values())
    return total, losses
