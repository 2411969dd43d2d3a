"""NesieHead: per-side distribution box regression + quality estimation.

TPU rebuild of reference mmdet3d/models/dense_heads/nesie_head.py: vote ->
aggregate (SA module) -> shared conv head -> integral side decode
(``side2box``) -> proposal jittering -> SidePooling quality module. The
losses live in nesie_tpu/losses and the target assignment in
nesie_tpu/train/targets.py so the head stays a pure forward.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nesie_tpu.ops import furthest_point_sample
from .heads import ReliableConvBboxHead, integral_expectation
from .pointnet2 import PointSAModule
from .side_pooling import SidePooling
from .vote import VoteModule


def side2box(aggregated_points, side_offsets, heading_pred, sizes):
    """Decode per-side offsets into 7-dof boxes.

    Mirrors reference NesieHead.side2box (nesie_head.py:150): the six
    integral expectations scale the fixed per-axis ``sizes`` and are
    subtracted/added from the aggregation center; heading from the
    (sin, cos) pair.

    Args:
        aggregated_points: (B, P, 3).
        side_offsets: (B, P, 6) integral expectations in [0, 1].
        heading_pred: (B, P, 2) raw (sin-ish, cos-ish) channels.
        sizes: (3,) fixed scale per axis.
    Returns:
        surface_pred (B, P, 6) ``(x1,y1,z1,x2,y2,z2)``;
        surface_scale (B, P, 6);
        bbox_pred (B, P, 7) gravity-centered box.
    """
    scale = jnp.asarray(list(sizes) + list(sizes), jnp.float32)
    scale = jnp.broadcast_to(scale, side_offsets.shape)
    lo = aggregated_points - side_offsets[..., :3] * scale[..., :3]
    hi = aggregated_points + side_offsets[..., 3:] * scale[..., 3:]
    surface_pred = jnp.concatenate([lo, hi], axis=-1)

    norm = jnp.sqrt(heading_pred[..., 0] ** 2 + heading_pred[..., 1] ** 2)
    norm = jnp.maximum(norm, 1e-12)
    sin = heading_pred[..., 0] / norm
    cos = heading_pred[..., 1] / norm
    heading = jnp.arctan2(sin, cos)

    center = 0.5 * (lo + hi)
    size = hi - lo
    bbox_pred = jnp.concatenate([center, size, heading[..., None]], axis=-1)
    return surface_pred, scale, bbox_pred


def jitter_boxes(rng, bbox_pred, noise_scale: float = 0.3, size_bias: float = 0.0):
    """Gaussian-jittered copies of the decoded boxes (nesie_head.py:178).

    Returns (B, P, 7) jittered boxes (heading copied verbatim).
    """
    center = bbox_pred[..., :3]
    size = bbox_pred[..., 3:6]
    heading = bbox_pred[..., 6]
    k1, k2 = jax.random.split(rng)
    center_j = center + size * jax.random.normal(k1, size.shape) * noise_scale
    size_j = size + size * (
        jax.random.normal(k2, size.shape) * noise_scale + size_bias
    )
    size_j = jnp.maximum(size_j, 1e-8)
    return jnp.concatenate([center_j, size_j, heading[..., None]], axis=-1)


class NesieHead(nn.Module):
    """Forward pass of the Nesie detection head.

    Returns a results dict with the same keys/semantics as the reference
    (channels-last shapes): obj_scores (B,P,2), sem_scores (B,P,C),
    bbox_preds (B,P,7), surface_pred/scale (B,P,6), bbox_probs (B,P,6,n+1),
    jitter_bbox_preds (B,P,7), iou_scores (B,P,C) [sigmoided],
    iou_scores_jitter, side_scores (B,P,6,C) [sigmoided], side_scores_jitter,
    plus seed/vote/aggregated tensors.
    """

    num_classes: int = 18
    reg_max: int = 32
    num_proposal: int = 256
    seed_feat_dim: int = 256
    sizes: Sequence[float] = (3.0, 3.0, 2.5)
    vote_conv_channels: Sequence[int] = (256, 256)
    agg_radius: float = 0.3
    agg_num_sample: int = 16
    agg_mlp_channels: Sequence[int] = (128, 128, 128)
    pred_shared_channels: Sequence[int] = (128, 128)
    dataset_name: str = "ScanNet"
    seed_fps_prefix_opt: bool = True
    jitter_scale: float = 0.3
    jitter_size_bias: float = 0.0

    def setup(self):
        self.vote_module = VoteModule(
            in_channels=self.seed_feat_dim, conv_channels=self.vote_conv_channels
        )
        self.vote_aggregation = PointSAModule(
            num_point=self.num_proposal,
            radius=self.agg_radius,
            num_sample=self.agg_num_sample,
            mlp_channels=self.agg_mlp_channels,
        )
        self.n_reg_outs = 6 * (self.reg_max + 1)
        self.conv_pred = ReliableConvBboxHead(
            shared_conv_channels=self.pred_shared_channels,
            num_cls_out=self.num_classes + 2,
            num_bbox_out=self.n_reg_outs,
            num_heading_out=2,
            reg_max=self.reg_max,
        )
        self.grid_conv = SidePooling(
            num_classes=self.num_classes, reg_max=self.reg_max
        )

    def __call__(self, feat_dict, sample_mod: str, rng, train: bool = False,
                 with_jitter: bool = True):
        """``with_jitter=False`` skips the jittered proposal copies through
        the quality module. At eval (train=False) this is NUMERICALLY
        IDENTICAL for every main-proposal output — BatchNorm uses running
        stats, so proposals are independent — and halves the quality-module
        cost; the jittered outputs exist only for the training losses
        (reference nesie_head.py:178-209,369-396). Keep the default (True)
        whenever loss terms will consume ``*_jitter`` keys or train-mode
        BN statistics must match the reference's 2P-proposal batch."""
        assert sample_mod in ("vote", "seed", "random", "spec")
        seed_points = feat_dict["fp_xyz"][-1]
        seed_features = feat_dict["fp_features"][-1]
        seed_indices = feat_dict["fp_indices"][-1]

        vote_points, vote_features, vote_offset = self.vote_module(
            seed_points, seed_features, train=train
        )
        results = dict(
            seed_points=seed_points,
            seed_features=seed_features,
            seed_indices=seed_indices,
            vote_points=vote_points,
            vote_features=vote_features,
            vote_offset=vote_offset,
        )

        if sample_mod == "vote":
            agg = self.vote_aggregation(vote_points, vote_features, train=train)
        elif sample_mod == "seed":
            if self.seed_fps_prefix_opt:
                # seeds are the FPS-ordered SA2 points: FPS prefix
                # consistency makes the head's seed FPS a free arange
                B = seed_points.shape[0]
                sample_indices = jnp.broadcast_to(
                    jnp.arange(self.num_proposal, dtype=jnp.int32)[None],
                    (B, self.num_proposal),
                )
            else:
                sample_indices = furthest_point_sample(
                    seed_points, self.num_proposal
                )
            agg = self.vote_aggregation(
                vote_points, vote_features, train=train, indices=sample_indices
            )
        elif sample_mod == "random":
            rng, sub = jax.random.split(rng)
            B, num_seed = seed_points.shape[:2]
            sample_indices = jax.random.randint(
                sub, (B, self.num_proposal), 0, num_seed, dtype=jnp.int32
            )
            agg = self.vote_aggregation(
                vote_points, vote_features, train=train, indices=sample_indices
            )
        else:  # spec
            agg = self.vote_aggregation(
                seed_points, seed_features, train=train, target_xyz=vote_points
            )
        aggregated_points, features, aggregated_indices = agg
        results["aggregated_points"] = aggregated_points
        results["aggregated_features"] = features
        results["aggregated_indices"] = aggregated_indices

        cls_pred, reg_pred = self.conv_pred(features, train=train)
        results["obj_scores"] = cls_pred[..., :2]
        results["sem_scores"] = cls_pred[..., 2:]

        B, P = reg_pred.shape[:2]
        dist_logits = reg_pred[..., : self.n_reg_outs].reshape(
            B, P, 6, self.reg_max + 1
        )
        side_offsets = integral_expectation(dist_logits, self.reg_max)
        surface_pred, surface_scale, bbox_pred = side2box(
            aggregated_points, side_offsets, reg_pred[..., self.n_reg_outs :],
            self.sizes,
        )
        results["surface_pred"] = surface_pred
        results["surface_scale"] = surface_scale
        results["bbox_preds"] = bbox_pred
        results["bbox_probs"] = jax.nn.softmax(dist_logits, axis=-1)

        # --- quality module on detached, jitter-augmented boxes ---
        if with_jitter:
            rng, sub = jax.random.split(rng)
            jitter = jitter_boxes(
                sub, bbox_pred, self.jitter_scale, self.jitter_size_bias
            )
            results["jitter_bbox_preds"] = jitter
            both = jnp.concatenate([bbox_pred, jitter], axis=1)  # (B, 2P, 7)
        else:
            both = bbox_pred
        center = jax.lax.stop_gradient(both[..., :3])
        size = jax.lax.stop_gradient(both[..., 3:6])
        if self.dataset_name == "ScanNet":
            heading = jnp.zeros_like(both[..., 6])
        else:
            heading = jax.lax.stop_gradient(both[..., 6])

        side_scores, iou_scores = self.grid_conv(
            center,
            size,
            heading,
            jax.lax.stop_gradient(seed_points),
            jax.lax.stop_gradient(seed_features),
            jax.lax.stop_gradient(results["bbox_probs"]),
            train=train,
        )
        iou_scores = jax.nn.sigmoid(iou_scores)
        side_scores = jax.nn.sigmoid(side_scores)
        results["iou_scores"] = iou_scores[:, :P]
        results["side_scores"] = side_scores[:, :P]
        if with_jitter:
            results["iou_scores_jitter"] = iou_scores[:, P:]
            results["side_scores_jitter"] = side_scores[:, P:]
        return results
