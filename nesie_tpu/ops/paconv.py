"""Position-adaptive convolution (reference mmdet3d/ops/paconv/paconv.py:
ScoreNet + PAConv, the non-CUDA formulation). Present-but-unused parity
op, faithful to the reference math (oracle-tested against the reference
module forward in tests/test_reference_oracle6.py):

* ScoreNet maps per-pair xyz features through 1x1 Conv+BN+ReLU MLPs to
  M mixing scores (paconv.py:12-104; last layer bias, no act, optional
  last_bn; softmax/sigmoid with a temperature).
* PAConv builds the kernel input (``w_neighbor``: concat of
  (feat - center, feat), paconv.py:264-268; K slot 0 is the center),
  multiplies by the (kernel_mul*in_c, M*out_c) weight bank, and
  aggregates with the scores (utils.assign_score) — followed by BN2d
  (momentum 0.1) + ReLU (paconv.py:283-296).

The CUDA ``assign_score_withk`` fused gather+mix (used only by
PAConvCUDA) becomes one einsum on the MXU (``assign_score_withk``
below + ``assign_kernel_withoutk`` mirroring utils.py:47-88).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def assign_score_withk(scores, point_feats, center_feats, knn_idx):
    """Fused score-weighted feature mixing (reference
    paconv/src/assign_score_withk_cuda.cu, aggregate='sum').

    Args:
        scores: (B, N, K, M) mixing scores over M weight-bank outputs.
        point_feats: (B, Npoint, M, C) per-point features already multiplied
            by each bank matrix.
        center_feats: (B, Npoint, M, C) same for the centers.
        knn_idx: (B, N, K) neighbor indices into Npoint.
    Returns:
        (B, N, K, C): score-mixed (neighbor - center) features.
    """
    B, N, K, M = scores.shape
    C = point_feats.shape[-1]
    idx = knn_idx.reshape(B, N * K)[..., None, None]
    gathered = jnp.take_along_axis(
        point_feats, idx.astype(jnp.int32).repeat(M, -2).repeat(C, -1), axis=1
    ).reshape(B, N, K, M, C)
    centers = center_feats[:, :, None]  # broadcast over K
    diff = gathered - centers[:, : N if centers.shape[1] >= N else None]
    return jnp.einsum("bnkm,bnkmc->bnkc", scores, diff)


class ScoreNet(nn.Module):
    """Per-pair xyz features -> weight-bank scores (reference ScoreNet,
    paconv.py:12-104). ``mlp_channels`` is the full chain including the
    input width and the final M, as in the reference."""

    mlp_channels: Sequence[int]
    last_bn: bool = False
    score_norm: str = "softmax"
    temp_factor: float = 1.0

    @nn.compact
    def __call__(self, xyz_features, train: bool = False):
        """xyz_features: (B, npoint, K, C_in) -> scores (B, npoint, K, M)."""
        assert self.score_norm in ("softmax", "sigmoid", "identity")
        h = xyz_features
        n = len(self.mlp_channels)
        for i in range(n - 2):
            # ConvModule 1x1: conv (bias='auto' -> False under BN) + BN + ReLU
            h = nn.Dense(self.mlp_channels[i + 1], use_bias=False,
                         name=f"layer{i}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"layer{i}_bn")(h)
            h = nn.relu(h)
        i = n - 2
        # last layer: no act; bias unless last_bn (paconv.py:60-71)
        h = nn.Dense(self.mlp_channels[-1], use_bias=not self.last_bn,
                     name=f"layer{i}_conv")(h)
        if self.last_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"layer{i}_bn")(h)
        if self.score_norm == "softmax":
            return jax.nn.softmax(h / self.temp_factor, axis=-1)
        if self.score_norm == "sigmoid":
            return jax.nn.sigmoid(h / self.temp_factor)
        return h


class PAConv(nn.Module):
    """Position-adaptive conv over grouped neighborhoods, channels-last.

    Call with features (B, npoint, K, in_c) and grouped coordinates
    points_xyz (B, npoint, K, 3); K slot 0 must be the grouping center
    (the reference takes ``[..., :1]`` as the center, paconv.py:231,265).
    Returns (B, npoint, K, out_c).
    """

    in_channels: int
    out_channels: int
    num_kernels: int = 8
    scorenet_input: str = "w_neighbor_dist"  # identity|w_neighbor|w_neighbor_dist
    kernel_input: str = "w_neighbor"  # identity|w_neighbor
    scorenet_mlp: Sequence[int] = (8, 16, 16)
    score_norm: str = "softmax"
    temp_factor: float = 1.0
    last_bn: bool = False
    with_norm: bool = True
    with_act: bool = True

    @nn.compact
    def __call__(self, features, points_xyz, train: bool = False):
        kernel_mul = 2 if self.kernel_input == "w_neighbor" else 1
        center_xyz = points_xyz[..., :1, :]
        xyz_diff = points_xyz - center_xyz
        if self.scorenet_input == "identity":
            xyz_features = xyz_diff
        elif self.scorenet_input == "w_neighbor":
            xyz_features = jnp.concatenate([xyz_diff, points_xyz], axis=-1)
        else:  # w_neighbor_dist: (center, diff, euclidian dist)
            dist = jnp.linalg.norm(xyz_diff, axis=-1, keepdims=True)
            xyz_features = jnp.concatenate(
                [jnp.broadcast_to(center_xyz, points_xyz.shape), xyz_diff,
                 dist], axis=-1)

        if self.kernel_input == "w_neighbor":
            center_features = features[..., :1, :]
            features = jnp.concatenate(
                [features - center_features, features], axis=-1)

        scores = ScoreNet(
            mlp_channels=(xyz_features.shape[-1], *self.scorenet_mlp,
                          self.num_kernels),
            last_bn=self.last_bn, score_norm=self.score_norm,
            temp_factor=self.temp_factor, name="scorenet",
        )(xyz_features, train=train)

        # reference layout: (kernel_mul * in_c, M * out_c) (paconv.py:195-199)
        bank = self.param(
            "weight_bank",
            nn.initializers.lecun_normal(),
            (kernel_mul * self.in_channels,
             self.num_kernels * self.out_channels),
        )
        B, npoint, K, _ = features.shape
        new_features = (features @ bank).reshape(
            B, npoint, K, self.num_kernels, self.out_channels)
        out = jnp.einsum("bnkm,bnkmc->bnkc", scores, new_features)

        if self.with_norm:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name="bn")(out)
        if self.with_act:
            out = nn.relu(out)
        return out
