"""PointNet++ set-abstraction / feature-propagation and the SSG backbone.

TPU-native rebuild of the reference's PointSAModule / PointFPModule /
PointNet2SASSG (reference mmdet3d/ops/pointnet_modules/point_sa_module.py,
point_fp_module.py, mmdet3d/models/backbones/pointnet2_sa_ssg.py):
sample (FPS) -> group (ball query, duplicate-fill padding) -> per-point MLP
-> max-pool. All shapes static; layout channels-last.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from nesie_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_nn,
    three_interpolate,
)
from .layers import PointMLP


class PointSAModule(nn.Module):
    """Single-scale-grouping set abstraction.

    Matches reference PointSAModule semantics: D-FPS sampling (or caller
    indices / target xyz), ball-query grouping with relative-xyz
    (optionally radius-normalized) prepended to grouped features, shared
    MLP, max-pool over the neighborhood.
    """

    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True
    pool: str = "max"
    dtype: object = None
    input_fps_ordered: bool = False

    @nn.compact
    def __call__(
        self,
        xyz,
        features,
        train: bool = False,
        indices=None,
        target_xyz=None,
    ):
        """Args:
            xyz: (B, N, 3); features: (B, N, C) or None.
            indices: (B, num_point) precomputed sample indices (the head's
                'seed' mode); target_xyz: (B, num_point, 3) explicit centers
                (the 'spec' mode).
        Returns:
            new_xyz (B, M, 3), new_features (B, M, mlp[-1]), indices (B, M).

        ``input_fps_ordered``: FPS is prefix-consistent — if X was produced
        by (and gathered in) FPS order from the same start point, then
        FPS(X, m) is exactly the first m elements of X (the global argmax at
        each step lies in the subset, so it is also the subset argmax; only
        exact-tie breaking can differ). Stages whose input is a previous
        FPS output can therefore skip the sequential kernel entirely.
        """
        if target_xyz is not None:
            new_xyz = target_xyz
        else:
            if indices is None:
                if self.input_fps_ordered:
                    B, N = xyz.shape[:2]
                    indices = jnp.broadcast_to(
                        jnp.arange(self.num_point, dtype=jnp.int32)[None],
                        (B, self.num_point),
                    )
                else:
                    indices = furthest_point_sample(xyz, self.num_point)
            new_xyz = gather_points(xyz, indices)

        idx = ball_query(xyz, new_xyz, self.radius, self.num_sample)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius

        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz

        out = PointMLP(self.mlp_channels, dtype=self.dtype, name="mlp")(
            grouped, train=train
        )
        if self.pool == "max":
            out = jnp.max(out, axis=2)
        else:
            out = jnp.mean(out, axis=2)
        return new_xyz, out, indices


class PAConvSAModule(nn.Module):
    """SSG set abstraction with PAConv layers as the shared MLP (reference
    paconv_sa_module.py:10-140 PAConvSAModule): D-FPS sample, ball-query
    group, then a chain of PAConv layers each consuming (features,
    grouped_xyz) — grouped xyz are *relative* and, per the reference
    default, NOT radius-normalized (normalize_xyz=False) — followed by a
    neighborhood pool. When ``use_xyz`` the relative xyz are prepended to
    the grouped features (mlp_channel[0] += 3, paconv_sa_module.py:86-88).
    """

    num_point: int
    radius: float
    num_sample: int
    mlp_channels: Sequence[int]  # feature widths, excluding the +3 for xyz
    paconv_num_kernels: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = False
    pool: str = "max"
    kernel_input: str = "w_neighbor"
    scorenet_input: str = "w_neighbor_dist"
    scorenet_mlp: Sequence[int] = (16, 16, 16)  # paconv_sa_module.py:60

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, indices=None,
                 target_xyz=None):
        from nesie_tpu.ops.paconv import PAConv

        if target_xyz is not None:
            new_xyz = target_xyz
        else:
            if indices is None:
                indices = furthest_point_sample(xyz, self.num_point)
            new_xyz = gather_points(xyz, indices)

        idx = ball_query(xyz, new_xyz, self.radius, self.num_sample)
        grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
        if self.normalize_xyz:
            grouped_xyz = grouped_xyz / self.radius

        if features is not None:
            grouped = group_points(features, idx)
            if self.use_xyz:
                grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
        else:
            grouped = grouped_xyz

        chain = [grouped.shape[-1], *self.mlp_channels[1:]]
        h = grouped
        for i in range(len(chain) - 1):
            h = PAConv(
                in_channels=chain[i],
                out_channels=chain[i + 1],
                num_kernels=self.paconv_num_kernels[i],
                kernel_input=self.kernel_input,
                scorenet_input=self.scorenet_input,
                scorenet_mlp=self.scorenet_mlp,
                name=f"layer{i}",
            )(h, grouped_xyz, train=train)
        if self.pool == "max":
            out = jnp.max(h, axis=2)
        else:
            out = jnp.mean(h, axis=2)
        return new_xyz, out, indices


class PointSAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference PointSAModuleMSG,
    point_sa_module.py:215): one FPS sample set, several ball-query scales,
    concatenated pooled features."""

    num_point: int
    radii: Sequence[float]
    sample_nums: Sequence[int]
    mlp_channels: Sequence[Sequence[int]]
    use_xyz: bool = True
    normalize_xyz: bool = True
    pool: str = "max"
    dtype: object = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False, indices=None,
                 target_xyz=None):
        if target_xyz is not None:
            new_xyz = target_xyz
        else:
            if indices is None:
                indices = furthest_point_sample(xyz, self.num_point)
            new_xyz = gather_points(xyz, indices)

        outs = []
        for i, (radius, k) in enumerate(zip(self.radii, self.sample_nums)):
            idx = ball_query(xyz, new_xyz, radius, k)
            grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / radius
            if features is not None:
                grouped = group_points(features, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped], axis=-1)
            else:
                grouped = grouped_xyz
            out = PointMLP(self.mlp_channels[i], dtype=self.dtype,
                           name=f"mlp{i}")(grouped, train=train)
            outs.append(
                jnp.max(out, axis=2) if self.pool == "max" else jnp.mean(out, axis=2)
            )
        return new_xyz, jnp.concatenate(outs, axis=-1), indices


class PointFPModule(nn.Module):
    """Feature propagation: 3-NN inverse-distance interpolation + MLP."""

    mlp_channels: Sequence[int]
    dtype: object = None

    @nn.compact
    def __call__(self, target_xyz, source_xyz, target_feats, source_feats,
                 train: bool = False):
        """Args:
            target_xyz: (B, n, 3) points to propagate to.
            source_xyz: (B, m, 3) points to propagate from.
            target_feats: (B, n, C1) or None; source_feats: (B, m, C2).
        Returns:
            (B, n, mlp[-1]).
        """
        dist, idx = three_nn(target_xyz, source_xyz)
        recip = 1.0 / (dist + 1e-8)
        weight = recip / jnp.sum(recip, axis=2, keepdims=True)
        interp = three_interpolate(source_feats, idx, weight)
        if target_feats is not None:
            interp = jnp.concatenate([interp, target_feats], axis=-1)
        return PointMLP(self.mlp_channels, dtype=self.dtype, name="mlp")(
            interp, train=train
        )


class PointNet2SASSG(nn.Module):
    """PointNet++ SSG backbone (reference pointnet2_sa_ssg.py:11).

    Returns a dict with fp_xyz / fp_features / fp_indices (last entries are
    the seed set consumed by the vote head) plus the sa_* pyramids.
    """

    in_channels: int = 4  # xyz + height
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128),
        (128, 128, 256),
        (128, 128, 256),
        (128, 128, 256),
    )
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))
    compute_dtype: object = None  # e.g. jnp.bfloat16 for the MLP stacks
    # SA2+ inputs are FPS outputs gathered in selection order, so their FPS
    # reduces to arange (prefix consistency; see PointSAModule docstring)
    fps_prefix_opt: bool = True

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points: (B, N, in_channels) with xyz first."""
        xyz = points[..., :3]
        features = points[..., 3:] if self.in_channels > 3 else None

        B, N = xyz.shape[:2]
        indices = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.int32)[None], (B, N)
        )

        sa_xyz = [xyz]
        sa_features = [features]
        sa_indices = [indices]
        for i in range(len(self.num_points)):
            cur_xyz, cur_feat, cur_idx = PointSAModule(
                num_point=self.num_points[i],
                radius=self.radii[i],
                num_sample=self.num_samples[i],
                mlp_channels=self.sa_channels[i],
                dtype=self.compute_dtype,
                input_fps_ordered=self.fps_prefix_opt and i > 0,
                name=f"sa{i}",
            )(sa_xyz[-1], sa_features[-1], train=train)
            sa_xyz.append(cur_xyz)
            sa_features.append(cur_feat)
            sa_indices.append(
                jnp.take_along_axis(sa_indices[-1], cur_idx.astype(jnp.int32), axis=1)
            )

        num_sa = len(self.num_points)
        fp_xyz = [sa_xyz[-1]]
        fp_features = [sa_features[-1]]
        fp_indices = [sa_indices[-1]]
        for i in range(len(self.fp_channels)):
            tgt = num_sa - i - 1
            fp_features.append(
                PointFPModule(self.fp_channels[i], dtype=self.compute_dtype,
                              name=f"fp{i}")(
                    sa_xyz[tgt], sa_xyz[tgt + 1], sa_features[tgt], fp_features[-1],
                    train=train,
                )
            )
            fp_xyz.append(sa_xyz[tgt])
            fp_indices.append(sa_indices[tgt])

        return dict(
            fp_xyz=fp_xyz,
            fp_features=fp_features,
            fp_indices=fp_indices,
            sa_xyz=sa_xyz,
            sa_features=sa_features,
            sa_indices=sa_indices,
        )
