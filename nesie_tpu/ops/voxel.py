"""Voxelization + dynamic scatter (reference mmdet3d/ops/voxel/: hard &
dynamic voxelization CUDA kernels, scatter_points.py).

Not used by any shipped Nesie/SAQE config (VoteNet is point-based) but part
of the reference's op surface; rebuilt with static output shapes:
sort-by-voxel-id + segment ops instead of atomic scatter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VoxelizationResult(NamedTuple):
    voxels: jnp.ndarray      # (max_voxels, max_points, C)
    coords: jnp.ndarray      # (max_voxels, 3) integer grid coords (z, y, x)
    num_points: jnp.ndarray  # (max_voxels,)
    num_voxels: jnp.ndarray  # () actual voxel count
    valid: jnp.ndarray       # (max_voxels,) bool


def _grid_coords(points, voxel_size, point_range):
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(point_range[:3], jnp.float32)
    hi = jnp.asarray(point_range[3:], jnp.float32)
    grid = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    dims = jnp.ceil((hi - lo) / vs).astype(jnp.int32)
    in_range = jnp.all((grid >= 0) & (grid < dims), axis=1)
    return grid, dims, in_range


def voxelize(
    points,
    voxel_size,
    point_range,
    max_points: int = 35,
    max_voxels: int = 20000,
) -> VoxelizationResult:
    """Hard voxelization of one cloud (N, C) with static output shapes.

    Matches the reference kernel's semantics: at most ``max_points`` points
    per voxel (extras dropped), at most ``max_voxels`` voxels (in first-
    point-arrival order the CUDA kernel is nondeterministic; we use point
    index order, which is deterministic).
    """
    N, C = points.shape
    grid, dims, in_range = _grid_coords(points, voxel_size, point_range)
    linear = (grid[:, 2] * dims[1] + grid[:, 1]) * dims[0] + grid[:, 0]
    big = dims[0] * dims[1] * dims[2]
    linear = jnp.where(in_range, linear, big)  # invalid sorts last

    order = jnp.argsort(linear, stable=True)
    sorted_ids = linear[order]
    sorted_pts = points[order]
    sorted_grid = grid[order]

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    ) & (sorted_ids < big)
    seg = jnp.cumsum(is_start) - 1  # voxel slot per point
    # rank within segment
    idx = jnp.arange(N)
    start_pos = jnp.where(is_start, idx, 0)
    seg_start = jax.ops.segment_max(start_pos, seg.clip(0), num_segments=N)
    rank = idx - seg_start[seg.clip(0)]

    keep = (sorted_ids < big) & (seg < max_voxels) & (rank < max_points)
    seg_c = jnp.where(keep, seg, max_voxels)  # dump rejects into overflow row

    voxels = jnp.zeros((max_voxels + 1, max_points, C), points.dtype)
    voxels = voxels.at[seg_c, jnp.where(keep, rank, 0)].set(
        jnp.where(keep[:, None], sorted_pts, 0.0)
    )[:max_voxels]

    coords = jnp.zeros((max_voxels + 1, 3), jnp.int32)
    coords = coords.at[seg_c].set(sorted_grid[:, ::-1])[:max_voxels]  # (z,y,x)

    num_points = jax.ops.segment_sum(
        keep.astype(jnp.int32), seg_c, num_segments=max_voxels + 1
    )[:max_voxels]
    valid = num_points > 0
    return VoxelizationResult(
        voxels=voxels,
        coords=coords,
        num_points=num_points,
        num_voxels=jnp.sum(valid),
        valid=valid,
    )


def dynamic_scatter(points, coords_or_ids, num_segments: int, mode: str = "mean"):
    """Dynamic scatter (reference scatter_points.py): reduce point features
    into voxels by mean or max.

    Args:
        points: (N, C); coords_or_ids: (N,) int voxel ids in [0, num_segments)
            (out-of-range ids are dropped).
    Returns:
        (num_segments, C) reduced features.
    """
    ids = coords_or_ids.astype(jnp.int32)
    ok = (ids >= 0) & (ids < num_segments)
    safe = jnp.where(ok, ids, num_segments)
    if mode == "mean":
        tot = jax.ops.segment_sum(
            jnp.where(ok[:, None], points, 0.0), safe, num_segments=num_segments + 1
        )[:num_segments]
        cnt = jax.ops.segment_sum(
            ok.astype(points.dtype), safe, num_segments=num_segments + 1
        )[:num_segments]
        return tot / jnp.maximum(cnt[:, None], 1.0)
    if mode == "max":
        neg = jnp.full_like(points, -jnp.inf)
        out = jax.ops.segment_max(
            jnp.where(ok[:, None], points, neg), safe, num_segments=num_segments + 1
        )[:num_segments]
        return jnp.where(jnp.isfinite(out), out, 0.0)
    raise ValueError(mode)
