"""Side-aware quality estimation module (Nesie variant).

TPU rebuild of the reference SidePooling
(mmdet3d/models/dense_heads/side_pooling_module.py): build a
grid_size^3 grid in each (detached) predicted box, pull out the six face
grids, interpolate seed features at every grid point via 3-NN
inverse-distance weighting, run a MiniPointNet per face (+ one per whole
box), and predict per-class side quality scores and an IoU score.

Face order matches the reference extraction (side_pooling_module.py:139-147):
``[x-, x+, z+, z-, y-, y+]`` — the index-wise pairing of side scores with
the (x1,y1,z1,x2,y2,z2) surface order in the losses is the reference's own
convention and is preserved, not "fixed".
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from nesie_tpu.core.boxes import rotate_points_z
from nesie_tpu.ops import three_nn, group_points
from .layers import MiniPointNet, PointMLP


def _face_indices(g: int):
    """Index lists into the flattened g^3 grid for the 6 faces."""
    idx = np.arange(g * g * g).reshape(g, g, g)  # [ix, iy, iz]
    return [
        idx[0].reshape(-1),        # x- ("front" in the reference)
        idx[-1].reshape(-1),       # x+ ("back")
        idx[:, :, -1].reshape(-1), # z+ ("top")
        idx[:, :, 0].reshape(-1),  # z- ("down")
        idx[:, 0].reshape(-1),     # y- ("left")
        idx[:, -1].reshape(-1),    # y+ ("right")
    ]


def make_box_grids(center, size, heading, grid_size: int):
    """Whole-box and per-face world-space grids.

    Args:
        center: (B, K, 3); size: (B, K, 3); heading: (B, K).
    Returns:
        bbox_grid: (B, K, g^3, 3); side_grid: (B, K, 6*g^2, 3) — face order
        [x-, x+, z+, z-, y-, y+] concatenated.
    """
    g = grid_size
    step = jnp.linspace(-1.0, 1.0, g)
    gx, gy, gz = jnp.meshgrid(step, step, step, indexing="ij")
    local = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)  # (g^3, 3)
    local = local[None, None] * (size[..., None, :] / 2.0)  # (B, K, g^3, 3)

    faces = jnp.concatenate(
        [local[:, :, f] for f in _face_indices(g)], axis=2
    )  # (B, K, 6*g^2, 3)

    bbox_grid = rotate_points_z(local, heading) + center[:, :, None, :]
    side_grid = rotate_points_z(faces, heading) + center[:, :, None, :]
    return bbox_grid, side_grid


def interpolate_grid_features(seed_xyz, seed_feats, grid, center):
    """3-NN inverse-distance interpolation of seed features at grid points,
    with the grid's box-relative offsets prepended as 3 extra channels
    (reference grid_features, side_pooling_module.py:183).

    Args:
        seed_xyz: (B, N, 3); seed_feats: (B, N, C).
        grid: (B, K, G, 3) world-space grid points.
        center: (B, K, 3) box centers.
    Returns:
        (B, K, G, 3 + C).
    """
    B, K, G, _ = grid.shape
    flat = grid.reshape(B, K * G, 3)
    dist, idx = three_nn(flat, seed_xyz)
    weight = 1.0 / (dist + 1e-8)
    weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
    gathered = group_points(seed_feats, idx)  # (B, K*G, 3, C)
    interp = jnp.sum(gathered * weight[..., None], axis=2)
    interp = interp.reshape(B, K, G, -1)
    rel = grid - center[:, :, None, :]
    return jnp.concatenate([rel, interp], axis=-1)


class SidePooling(nn.Module):
    """Quality module: 6 side heads + 1 box IoU head.

    Call with the *already detached & jitter-concatenated* box parameters,
    exactly like the reference forward (nesie_head.py:264).
    """

    num_classes: int = 18
    seed_feat_dim: int = 256
    grid_size: int = 4
    reg_topk: int = 4
    reg_max: int = 32
    iou_class_depend: bool = True

    @nn.compact
    def __call__(self, center, size, heading, seed_xyz, seed_feats, bbox_probs,
                 train: bool = False):
        """Args:
            center/size: (B, K2, 3); heading: (B, K2) where K2 = 2 * P
                (main + jittered proposals) — or P at eval.
            seed_xyz: (B, N, 3); seed_feats: (B, N, C) (caller detaches).
            bbox_probs: (B, P, 6, reg_max+1) softmaxed side distributions of
                the *main* proposals (caller detaches); tiled over K2.
        Returns:
            side_scores: (B, K2, 6, num_classes) raw logits;
            iou_scores: (B, K2, iou_size) raw logits.
        """
        B, K2 = size.shape[:2]
        P = bbox_probs.shape[1]
        g = self.grid_size
        iou_size = self.num_classes if self.iou_class_depend else 1

        bbox_grid, side_grid = make_box_grids(center, size, heading, g)
        # two separate 3-NN+gather calls: a single merged call over the
        # concatenated grids is numerically identical but measured ~29 ms
        # SLOWER at eval shape on v5e (XLA fuses the smaller per-grid
        # pipelines better than one wide one)
        side_feats = interpolate_grid_features(seed_xyz, seed_feats,
                                               side_grid, center)
        bbox_feats = interpolate_grid_features(seed_xyz, seed_feats,
                                               bbox_grid, center)

        # distribution statistics: per side, [prob, top-k, var] (B,P,6,n+1+k+1)
        topk = jax.lax.top_k(bbox_probs, self.reg_topk)[0]
        stat = jnp.concatenate(
            [bbox_probs, topk, jnp.var(bbox_probs, axis=-1, keepdims=True)],
            axis=-1,
        )  # (B, P, 6, n+1+topk+1)
        reps = K2 // P
        stat = jnp.concatenate([stat] * reps, axis=1)  # tile over main+jitter

        side_scores = []
        for i in range(6):
            f = side_feats[:, :, i * g * g : (i + 1) * g * g]
            feat = MiniPointNet(128, name=f"side_mini{i}")(f, train=train)
            feat = jnp.concatenate([feat, stat[:, :, i]], axis=-1)
            score = PointMLP((128, 128), bias=True, name=f"side_head{i}_trunk")(
                feat, train=train
            )
            score = nn.Dense(iou_size, name=f"side_head{i}_out")(score)
            side_scores.append(score)
        side_scores = jnp.stack(side_scores, axis=2)  # (B, K2, 6, iou_size)

        box_feat = MiniPointNet(128, name="box_mini")(bbox_feats, train=train)
        iou = PointMLP((128, 128), bias=True, name="iou_head_trunk")(
            box_feat, train=train
        )
        iou = nn.Dense(iou_size, name="iou_head_out")(iou)
        return side_scores, iou
