"""SAQEHead: side-aware quality estimation head (reference
mmdet3d/models/dense_heads/saqe_head.py).

Differences from NesieHead (saqe_head.py:191-328):
  * bbox branch emits 3 extra channels -> learned per-axis log-scales
    (``exp``) instead of the fixed [3, 3, 2.5];
  * heading is a 12-bin AngleIntegral distribution -> angle in (-pi, pi];
  * stronger jitter (0.5 noise, +0.2 size bias) and a
    ``jitter_surface_preds`` output;
  * the QualityEstimation module replaces SidePooling, adding
    rotate_scores and R_obj_scores outputs.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nesie_tpu.losses.surface import bbox_to_surface
from nesie_tpu.ops import furthest_point_sample
from .heads import ReliableConvBboxHead, angle_integral_expectation, integral_expectation
from .nesie_head import jitter_boxes
from .pointnet2 import PointSAModule
from .quality_estimation import QualityEstimation
from .vote import VoteModule


class SAQEHead(nn.Module):
    num_classes: int = 18
    reg_max: int = 32
    num_heading_out: int = 12
    num_proposal: int = 256
    seed_feat_dim: int = 256
    vote_conv_channels: Sequence[int] = (256, 256)
    agg_radius: float = 0.3
    agg_num_sample: int = 16
    agg_mlp_channels: Sequence[int] = (128, 128, 128)
    pred_shared_channels: Sequence[int] = (128, 128)
    dataset_name: str = "ScanNet"
    seed_fps_prefix_opt: bool = True
    jitter_scale: float = 0.5
    jitter_size_bias: float = 0.2

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
            num_bbox_out=self.n_reg_outs + 3,  # +3 learned log-scales
            num_heading_out=self.num_heading_out,
            reg_max=self.reg_max,
        )
        self.grid_conv = QualityEstimation(
            num_classes=self.num_classes, reg_max=self.reg_max
        )

    def side2box(self, aggregated_points, reg_pred):
        """Learned-scale integral decode (saqe_head.py:191-218)."""
        B, P = reg_pred.shape[:2]
        dist_logits = reg_pred[..., : self.n_reg_outs].reshape(
            B, P, 6, self.reg_max + 1
        )
        offsets = integral_expectation(dist_logits, self.reg_max)  # (B, P, 6)
        log_scale = reg_pred[..., self.n_reg_outs : self.n_reg_outs + 3]
        scale3 = jnp.exp(log_scale)
        scale = jnp.concatenate([scale3, scale3], axis=-1)
        lo = aggregated_points - offsets[..., :3] * scale3
        hi = aggregated_points + offsets[..., 3:] * scale3
        surface_pred = jnp.concatenate([lo, hi], axis=-1)

        angles = angle_integral_expectation(
            reg_pred[..., self.n_reg_outs + 3 :]
        )  # (B, P)
        center = 0.5 * (lo + hi)
        size = hi - lo
        bbox = jnp.concatenate([center, size, angles[..., None]], axis=-1)
        return surface_pred, scale, bbox, dist_logits

    def __call__(self, feat_dict, sample_mod: str, rng, train: bool = False,
                 with_jitter: bool = True):
        """``with_jitter=False``: eval-only fast path — see
        NesieHead.__call__; numerically identical main outputs when
        train=False (running-stat BN), half the quality-module cost."""
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
        else:
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

        surface_pred, surface_scale, bbox_pred, dist_logits = self.side2box(
            aggregated_points, reg_pred
        )
        B, P = bbox_pred.shape[:2]
        results["surface_pred"] = surface_pred
        results["surface_scale"] = surface_scale
        results["bbox_preds"] = bbox_pred
        results["bbox_probs"] = jax.nn.softmax(dist_logits, axis=-1)

        if with_jitter:
            rng, sub = jax.random.split(rng)
            jitter = jitter_boxes(sub, bbox_pred, self.jitter_scale,
                                  self.jitter_size_bias)
            results["jitter_bbox_preds"] = jitter
            results["jitter_surface_preds"] = bbox_to_surface(jitter)
            both = jnp.concatenate([bbox_pred, jitter], axis=1)
        else:
            both = bbox_pred
        center = jax.lax.stop_gradient(both[..., :3])
        size = jax.lax.stop_gradient(both[..., 3:6])
        if self.dataset_name == "ScanNet":
            heading = jnp.zeros_like(both[..., 6])
        else:
            heading = jax.lax.stop_gradient(both[..., 6])

        side_scores, iou_scores, rotate_scores, r_obj_scores = self.grid_conv(
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
        rotate_scores = jax.nn.sigmoid(rotate_scores)
        results["iou_scores"] = iou_scores[:, :P]
        results["side_scores"] = side_scores[:, :P]
        results["rotate_scores"] = rotate_scores[:, :P]
        results["R_obj_scores"] = r_obj_scores[:, :P]
        if with_jitter:
            results["iou_scores_jitter"] = iou_scores[:, P:]
            results["side_scores_jitter"] = side_scores[:, P:]
            results["rotate_scores_jitter"] = rotate_scores[:, P:]
            results["R_obj_scores_jitter"] = r_obj_scores[:, P:]
        return results
