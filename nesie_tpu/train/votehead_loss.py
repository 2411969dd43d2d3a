"""Loss for the legacy VoteHead (reference vote_head.py:loss +
PartialBinBasedBBoxCoder.encode): bin-based direction/size targets with
chamfer assignment. Parity module; the Nesie path uses sup_loss.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nesie_tpu.losses import smooth_l1_loss, softmax_cross_entropy
from .sup_loss import NesieLossConfig, center_loss_fn, vote_loss_fn
from .targets import HeadTargets


@dataclass(frozen=True)
class VoteHeadLossConfig(NesieLossConfig):
    dir_class_weight: float = 1.0
    dir_res_weight: float = 10.0
    size_class_weight: float = 1.0
    size_res_weight: float = 10.0
    num_dir_bins: int = 1
    with_rot: bool = False


def votehead_supervised_loss(preds, targets: HeadTargets, mean_sizes,
                             cfg: VoteHeadLossConfig = VoteHeadLossConfig()):
    """Returns (total, dict). ``mean_sizes``: (num_sizes, 3)."""
    C = cfg.num_classes
    B, P = preds["obj_scores"].shape[:2]
    w = targets.box_loss_weights  # (B, P)

    losses = {}
    losses["vote_loss"] = vote_loss_fn(preds, targets, cfg)

    obj_ce = softmax_cross_entropy(
        preds["obj_scores"], targets.objectness_targets,
        class_weight=cfg.objectness_class_weight,
    )
    losses["objectness_loss"] = cfg.objectness_weight * jnp.sum(
        obj_ce * targets.objectness_weights
    )

    # center chamfer needs bbox-style center predictions
    decoded_center = preds["aggregated_points"] + preds["center_offset"]
    fake = dict(preds)
    fake["bbox_preds"] = decoded_center
    losses["center_loss"] = center_loss_fn(
        {"bbox_preds": decoded_center}, targets, cfg
    )

    # ---- direction ----
    gt_yaw = targets.bbox_targets[..., 6] % (2 * jnp.pi)
    if cfg.with_rot and cfg.num_dir_bins > 1:
        bin_width = 2 * jnp.pi / cfg.num_dir_bins
        shifted = (gt_yaw + bin_width / 2) % (2 * jnp.pi)
        dir_bin = jnp.floor(shifted / bin_width).astype(jnp.int32)
        dir_res_t = shifted - (dir_bin.astype(gt_yaw.dtype) + 0.5) * bin_width
        losses["dir_class_loss"] = cfg.dir_class_weight * jnp.sum(
            softmax_cross_entropy(preds["dir_class"], dir_bin) * w
        )
        res_pred = jnp.take_along_axis(
            preds["dir_res"], dir_bin[..., None], axis=-1
        )[..., 0]
        losses["dir_res_loss"] = cfg.dir_res_weight * jnp.sum(
            smooth_l1_loss(res_pred, dir_res_t) * w
        )
    else:
        losses["dir_class_loss"] = jnp.zeros(())
        losses["dir_res_loss"] = jnp.zeros(())

    # ---- size (cluster == semantic class, the indoor convention) ----
    size_cls_t = targets.mask_targets
    losses["size_class_loss"] = cfg.size_class_weight * jnp.sum(
        softmax_cross_entropy(preds["size_class"], size_cls_t) * w
    )
    mean = jnp.asarray(mean_sizes)[size_cls_t]  # (B, P, 3)
    size_res_t = (targets.bbox_targets[..., 3:6] - mean) / jnp.maximum(mean, 1e-6)
    res_pred = jnp.take_along_axis(
        preds["size_res"], size_cls_t[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :] / jnp.maximum(mean, 1e-6)
    losses["size_res_loss"] = cfg.size_res_weight * jnp.sum(
        jnp.mean(smooth_l1_loss(res_pred, size_res_t), axis=-1) * w
    )

    sem_ce = softmax_cross_entropy(preds["sem_scores"], targets.mask_targets)
    losses["semantic_loss"] = cfg.semantic_weight * jnp.sum(sem_ce * w)

    return sum(losses.values()), losses
