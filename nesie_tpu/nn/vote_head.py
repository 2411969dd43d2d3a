"""Legacy VoteNet head with the partial-bin-based box coder (reference
mmdet3d/models/dense_heads/vote_head.py + core/bbox/coders/
partial_bin_based_bbox_coder.py). Kept registered in the reference but not
used by the Nesie configs; provided for capability parity.

Prediction layout per proposal (the coder's split):
  center offset (3) | dir class (Nd) | dir res (Nd) | size class (Ns) |
  size res (Ns * 3) | sem (C)
objectness (2) comes from the cls branch.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from nesie_tpu.ops import furthest_point_sample
from .layers import PointMLP
from .pointnet2 import PointSAModule
from .vote import VoteModule


class BinBoxCoder(NamedTuple):
    """Partial-bin-based coder constants."""

    num_dir_bins: int
    num_sizes: int
    mean_sizes: jnp.ndarray  # (num_sizes, 3)
    with_rot: bool

    def decode(self, aggregated_points, preds):
        """preds dict -> (B, P, 7) gravity-centered boxes."""
        center = aggregated_points + preds["center_offset"]
        if self.with_rot:
            dir_cls = jnp.argmax(preds["dir_class"], axis=-1)
            dir_res = jnp.take_along_axis(
                preds["dir_res"], dir_cls[..., None], axis=-1
            )[..., 0]
            angle = (
                dir_cls.astype(center.dtype) * (2 * jnp.pi / self.num_dir_bins)
                + dir_res
            )
        else:
            angle = jnp.zeros(center.shape[:-1], center.dtype)
        size_cls = jnp.argmax(preds["size_class"], axis=-1)
        size_res = jnp.take_along_axis(
            preds["size_res"], size_cls[..., None, None].repeat(3, -1), axis=-2
        )[..., 0, :]
        base = self.mean_sizes[size_cls]
        size = jnp.maximum(base + size_res, 0.1)
        return jnp.concatenate([center, size, angle[..., None]], axis=-1)


class VoteHead(nn.Module):
    """Original VoteNet prediction head (vote -> aggregate -> MLP)."""

    num_classes: int = 18
    num_dir_bins: int = 1
    num_sizes: int = 18
    num_proposal: int = 256
    seed_feat_dim: int = 256
    with_rot: bool = False
    agg_radius: float = 0.3
    agg_num_sample: int = 16
    agg_mlp_channels: Sequence[int] = (128, 128, 128)
    pred_conv_channels: Sequence[int] = (128, 128)

    def setup(self):
        self.vote_module = VoteModule(
            in_channels=self.seed_feat_dim,
            conv_channels=(self.seed_feat_dim, self.seed_feat_dim),
        )
        self.vote_aggregation = PointSAModule(
            num_point=self.num_proposal,
            radius=self.agg_radius,
            num_sample=self.agg_num_sample,
            mlp_channels=self.agg_mlp_channels,
        )
        self.trunk = PointMLP(self.pred_conv_channels, bias=True)
        out_dim = (
            2  # objectness
            + 3
            + self.num_dir_bins * 2
            + self.num_sizes * 4
            + self.num_classes
        )
        self.conv_out = nn.Dense(out_dim)

    def coder(self, mean_sizes) -> BinBoxCoder:
        return BinBoxCoder(
            num_dir_bins=self.num_dir_bins,
            num_sizes=self.num_sizes,
            mean_sizes=jnp.asarray(mean_sizes, jnp.float32),
            with_rot=self.with_rot,
        )

    def __call__(self, feat_dict, sample_mod: str, rng, train: bool = False):
        seed_points = feat_dict["fp_xyz"][-1]
        seed_features = feat_dict["fp_features"][-1]
        seed_indices = feat_dict["fp_indices"][-1]
        vote_points, vote_features, vote_offset = self.vote_module(
            seed_points, seed_features, train=train
        )
        if sample_mod == "seed":
            idx = furthest_point_sample(seed_points, self.num_proposal)
            agg = self.vote_aggregation(
                vote_points, vote_features, train=train, indices=idx
            )
        else:
            agg = self.vote_aggregation(vote_points, vote_features, train=train)
        aggregated_points, features, aggregated_indices = agg

        x = self.trunk(features, train=train)
        out = self.conv_out(x)
        nd, ns, c = self.num_dir_bins, self.num_sizes, self.num_classes
        i = 0

        def take(n):
            nonlocal i
            v = out[..., i : i + n]
            i += n
            return v

        preds = dict(
            obj_scores=take(2),
            center_offset=take(3),
            dir_class=take(nd),
            dir_res_norm=take(nd),
            size_class=take(ns),
            size_res=take(ns * 3).reshape(out.shape[:-1] + (ns, 3)),
            sem_scores=take(c),
        )
        preds["dir_res"] = preds["dir_res_norm"] * (jnp.pi / nd)
        preds.update(
            seed_points=seed_points,
            seed_features=seed_features,
            seed_indices=seed_indices,
            vote_points=vote_points,
            vote_features=vote_features,
            vote_offset=vote_offset,
            aggregated_points=aggregated_points,
            aggregated_features=features,
            aggregated_indices=aggregated_indices,
        )
        return preds
