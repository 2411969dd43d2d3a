"""Vectorized target assignment for the Nesie/SAQE heads.

Static-shape rebuild of reference NesieHead.get_targets /
get_targets_single (nesie_head.py:511-679): ground truth arrives as padded
``(B, MAX_GT, 7)`` arrays + validity masks instead of python lists; the
per-GT python loops become masked vector ops.

Reference semantic quirks preserved deliberately:
  * vote slots: slot0/slot1 get the 1st/2nd containing box (in box index
    order); slot2 gets the *last* containing box once >=3 contain the point
    (the reference's clamp-at-2 overwrite, nesie_head.py:651); points in a
    single box replicate its vote to all three slots.
  * the padded zero-boxes participate in the proposal->GT chamfer *loss*
    (padding happens before the loss in the reference too) but not in the
    argmin *assignment* (computed pre-padding there).
  * empty scenes fall back to a single fake zero box with label 0
    (nesie_head.py:537-544) — with zero padding, slot 0 already is that box.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nesie_tpu.core.boxes import points_in_boxes
from nesie_tpu.losses.chamfer import chamfer_distance


class HeadTargets(NamedTuple):
    vote_targets: jnp.ndarray        # (B, N, 9)
    vote_target_masks: jnp.ndarray   # (B, N) int32
    center_targets: jnp.ndarray      # (B, MAX_GT, 3) gravity centers (padded 0)
    bbox_targets: jnp.ndarray        # (B, P, 7) assigned gravity-centered boxes
    mask_targets: jnp.ndarray        # (B, P) int32 class of assigned GT
    valid_gt_masks: jnp.ndarray      # (B, MAX_GT) float
    objectness_targets: jnp.ndarray  # (B, P) int32
    objectness_weights: jnp.ndarray  # (B, P) float, globally normalized
    box_loss_weights: jnp.ndarray    # (B, P) float, globally normalized
    valid_gt_weights: jnp.ndarray    # (B, MAX_GT) float, globally normalized
    assignment: jnp.ndarray          # (B, P) int32


def vote_targets_single(points, gt_boxes, gt_valid, gt_per_seed: int = 3):
    """Per-point vote targets for one scene.

    Args:
        points: (N, 3); gt_boxes: (MAX_GT, 7) *bottom-centered*;
        gt_valid: (MAX_GT,) bool.
    Returns:
        vote_targets (N, 3*gt_per_seed), vote_mask (N,) int32.
    """
    K = gt_boxes.shape[0]
    inside = points_in_boxes(points[None], gt_boxes[None])[0]  # (N, K)
    inside = inside & gt_valid[None, :]

    centers = gt_boxes[:, :3].at[:, 2].add(0.5 * gt_boxes[:, 5])  # gravity
    votes_all = centers[None, :, :] - points[:, None, :3]  # (N, K, 3)

    iota = jnp.arange(K, dtype=jnp.int32)
    key = jnp.where(inside, iota, K)  # (N, K)
    count = jnp.sum(inside, axis=-1)  # (N,)

    # 1st/2nd containing box = two min passes over the key row (cheaper
    # than a full 64-lane sort; key values are distinct below K, so
    # masking the first minimum's value isolates the second)
    first_key = jnp.min(key, axis=-1)
    second_key = jnp.min(
        jnp.where(key == first_key[:, None], K, key), axis=-1
    )
    first = jnp.clip(first_key, 0, K - 1)
    second = jnp.clip(second_key, 0, K - 1) if K > 1 else first
    last = jnp.max(jnp.where(inside, iota, -1), axis=-1)  # last containing
    last = jnp.clip(last, 0, K - 1)
    third_ref = jnp.where(count >= 3, last, first)  # clamp-at-2 overwrite

    def take(idx):
        return jnp.take_along_axis(votes_all, idx[:, None, None], axis=1)[:, 0]

    v0 = take(first)
    v1 = jnp.where((count >= 2)[:, None], take(second), v0)
    v2 = jnp.where((count >= 3)[:, None], take(third_ref), v0)
    votes = jnp.concatenate([v0, v1, v2][:gt_per_seed], axis=-1)

    mask = (count > 0).astype(jnp.int32)
    votes = votes * mask[:, None]
    return votes, mask


def get_targets(
    points,
    gt_boxes,
    gt_labels,
    gt_valid,
    aggregated_points,
    pos_distance_thr: float = 0.3,
    neg_distance_thr: float = 0.6,
    gt_per_seed: int = 3,
) -> HeadTargets:
    """Batched target assignment.

    Args:
        points: (B, N, >=3) scene points.
        gt_boxes: (B, MAX_GT, 7) *bottom-centered* boxes, zero-padded.
        gt_labels: (B, MAX_GT) int32, zero-padded.
        gt_valid: (B, MAX_GT) bool.
        aggregated_points: (B, P, 3) proposal centers.
    """
    B, P = aggregated_points.shape[:2]

    votes, vote_masks = jax.vmap(
        lambda p, b, v: vote_targets_single(p, b, v, gt_per_seed)
    )(points[..., :3], gt_boxes, gt_valid)

    centers = gt_boxes[..., :3].at[..., 2].add(0.5 * gt_boxes[..., 5])
    centers = centers * gt_valid[..., None]  # padded rows -> exact zeros

    dist_sq, _, assignment, _ = chamfer_distance(
        aggregated_points, centers, mode="l2", dst_valid=gt_valid
    )
    euclid = jnp.sqrt(dist_sq + 1e-6)

    objectness_targets = (euclid < pos_distance_thr).astype(jnp.int32)
    objectness_masks = (
        (euclid < pos_distance_thr) | (euclid > neg_distance_thr)
    ).astype(jnp.float32)

    objectness_weights = objectness_masks / (jnp.sum(objectness_masks) + 1e-6)
    box_loss_weights = objectness_targets.astype(jnp.float32) / (
        jnp.sum(objectness_targets).astype(jnp.float32) + 1e-6
    )
    valid_f = gt_valid.astype(jnp.float32)
    valid_gt_weights = valid_f / (jnp.sum(valid_f) + 1e-6)

    mask_targets = jnp.take_along_axis(gt_labels, assignment, axis=1)
    assigned_boxes = jnp.take_along_axis(
        gt_boxes, assignment[..., None], axis=1
    )  # (B, P, 7) bottom-centered
    assigned_centers = jnp.take_along_axis(centers, assignment[..., None], axis=1)
    bbox_targets = jnp.concatenate(
        [assigned_centers, assigned_boxes[..., 3:]], axis=-1
    )  # gravity-centered, matching reference nesie_head.py:676

    return HeadTargets(
        vote_targets=votes,
        vote_target_masks=vote_masks,
        center_targets=centers,
        bbox_targets=bbox_targets,
        mask_targets=mask_targets.astype(jnp.int32),
        valid_gt_masks=valid_f,
        objectness_targets=objectness_targets,
        objectness_weights=objectness_weights,
        box_loss_weights=box_loss_weights,
        valid_gt_weights=valid_gt_weights,
        assignment=assignment.astype(jnp.int32),
    )
