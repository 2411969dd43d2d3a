"""SAQE quality estimation module (reference
mmdet3d/models/dense_heads/quelity_estimation_module.py).

Differences from Nesie's SidePooling:
  * grid_size 3 and each face grid is tripled along its normal
    (grid +/- 10% of the normal coordinate, quelity_estimation_module.py:
    142-164) -> 27 points per face;
  * shallower per-side heads, MiniPointNet hide_dim 128;
  * no whole-box grid — a single fused head over the concatenated 6 side
    features predicts iou_scores + rotate_scores + R_obj_scores (:64-74,
    330-345).
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from nesie_tpu.core.boxes import rotate_points_z
from .layers import MiniPointNet, PointMLP
from .side_pooling import _face_indices, interpolate_grid_features


def make_saqe_side_grids(center, size, heading, grid_size: int = 3):
    """Per-face grids, each tripled along its own normal axis.

    Returns (B, K, 6 * 3 * g^2, 3) world-space points, face order
    [x-, x+, z+, z-, y-, y+]; each face's +/-10% offset acts along its own
    normal axis (x faces -> x, z faces -> z, y faces -> y), matching the
    reference's component zeroing at quelity_estimation_module.py:142-164.
    """
    g = grid_size
    step = jnp.linspace(-1.0, 1.0, g)
    gx, gy, gz = jnp.meshgrid(step, step, step, indexing="ij")
    local = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    local = local[None, None] * (size[..., None, :] / 2.0)  # (B, K, g^3, 3)

    faces = [local[:, :, f] for f in _face_indices(g)]
    # which coordinate axes get the +/-10% jitter per face (reference zeroes
    # the complement): x-, x+ -> x ; z+, z- -> z ; y-, y+ -> y
    keep_axis = [0, 0, 2, 2, 1, 1]
    jittered = []
    for face, ax in zip(faces, keep_axis):
        zero = face * 0.1
        mask = jnp.zeros((3,)).at[ax].set(1.0)
        zero = zero * mask
        jittered.append(jnp.concatenate([face - zero, face, face + zero], axis=2))
    side = jnp.concatenate(jittered, axis=2)  # (B, K, 6*3*g^2, 3)
    return rotate_points_z(side, heading) + center[:, :, None, :]


class QualityEstimation(nn.Module):
    num_classes: int = 18
    seed_feat_dim: int = 256
    grid_size: int = 3
    reg_topk: int = 4
    reg_max: int = 32
    iou_class_depend: bool = True

    @nn.compact
    def __call__(self, center, size, heading, seed_xyz, seed_feats, bbox_probs,
                 train: bool = False):
        """Same call convention as SidePooling. Returns
        (side_scores (B, K2, 6, C), iou_scores (B, K2, C),
         rotate_scores (B, K2, C), r_obj_scores (B, K2, 2)) raw logits."""
        B, K2 = size.shape[:2]
        P = bbox_probs.shape[1]
        g = self.grid_size
        iou_size = self.num_classes if self.iou_class_depend else 1
        n_face = 3 * g * g

        side_grid = make_saqe_side_grids(center, size, heading, g)
        side_feats = interpolate_grid_features(seed_xyz, seed_feats, side_grid, center)

        topk = jax.lax.top_k(bbox_probs, self.reg_topk)[0]
        stat = jnp.concatenate(
            [bbox_probs, topk, jnp.var(bbox_probs, axis=-1, keepdims=True)],
            axis=-1,
        )
        stat = jnp.concatenate([stat] * (K2 // P), axis=1)

        side_scores = []
        fused = []
        for i in range(6):
            f = side_feats[:, :, i * n_face : (i + 1) * n_face]
            feat = MiniPointNet(128, hide_dim=128, name=f"side_mini{i}")(
                f, train=train
            )
            feat = jnp.concatenate([feat, stat[:, :, i]], axis=-1)
            fused.append(feat)
            score = PointMLP((128,), bias=True, name=f"side_head{i}_trunk")(
                feat, train=train
            )
            score = nn.Dense(iou_size, name=f"side_head{i}_out")(score)
            side_scores.append(score)
        side_scores = jnp.stack(side_scores, axis=2)

        fused = jnp.concatenate(fused, axis=-1)  # (B, K2, 6*(128+stat))
        glob = PointMLP((512, 256), bias=True, name="global_trunk")(
            fused, train=train
        )
        glob = nn.Dense(iou_size * 2 + 2, name="global_out")(glob)
        iou_scores = glob[..., :iou_size]
        rotate_scores = glob[..., iou_size : 2 * iou_size]
        r_obj_scores = glob[..., 2 * iou_size :]
        return side_scores, iou_scores, rotate_scores, r_obj_scores
