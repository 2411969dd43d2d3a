"""RoIAware 3D pooling (reference
mmdet3d/ops/roiaware_pool3d/roiaware_pool3d.py:9-44 +
src/roiaware_pool3d_kernel.cu).

Pools per-point features into a fixed (out_x, out_y, out_z) voxel grid in
each rotated roi's local frame. The CUDA version scatters point indices
into per-voxel slot lists with atomics; here voxel assignment is a dense
vectorized computation and the pooling is a batched segment reduction —
static shapes, no atomics, autodiff-friendly (the gradient of
segment_max/segment_sum reproduces the hand-written CUDA backward).

Exact reference semantics preserved:
  * local frame rotation by (rz + pi/2) (kernel.cu:17-25), x voxels span
    the *length* l (dim 4), y voxels the width w (dim 3);
  * strict x/y inequalities, inclusive z band (kernel.cu:27-42);
  * rois give the BOTTOM center, z voxel index from z - cz;
  * at most ``max_pts_per_voxel - 1`` points per voxel, taken in point
    order (slot 0 of the CUDA list is the counter, kernel.cu:96-122);
  * empty voxels pool to 0 in both modes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _voxel_ids(rois, pts, out_size):
    """Per (roi, point): flat voxel id in [0, V) or -1 if outside the roi."""
    nx, ny, nz = out_size
    cx, cy, cz = rois[:, 0], rois[:, 1], rois[:, 2]
    w, l, h = rois[:, 3], rois[:, 4], rois[:, 5]
    rz = rois[:, 6]

    sx = pts[None, :, 0] - cx[:, None]
    sy = pts[None, :, 1] - cy[:, None]
    sz = pts[None, :, 2] - cz[:, None]

    rot = rz + jnp.pi / 2
    cosa, sina = jnp.cos(rot)[:, None], jnp.sin(rot)[:, None]
    local_x = sx * cosa - sy * sina
    local_y = sx * sina + sy * cosa

    half_w, half_l, half_h = w[:, None] / 2, l[:, None] / 2, h[:, None] / 2
    inside = (
        (jnp.abs(sz - half_h) <= half_h)
        & (local_x > -half_l) & (local_x < half_l)
        & (local_y > -half_w) & (local_y < half_w)
    )

    x_idx = jnp.clip((local_x + half_l) / (l[:, None] / nx), 0, nx - 1)
    y_idx = jnp.clip((local_y + half_w) / (w[:, None] / ny), 0, ny - 1)
    z_idx = jnp.clip(sz / (h[:, None] / nz), 0, nz - 1)
    vox = (
        x_idx.astype(jnp.int32) * (ny * nz)
        + y_idx.astype(jnp.int32) * nz
        + z_idx.astype(jnp.int32)
    )
    return jnp.where(inside, vox, -1)


def _rank_in_voxel(vox):
    """Occurrence rank of each point within its voxel, in point order
    (matches the CUDA sequential collection, kernel.cu:108-122)."""
    n = vox.shape[0]
    order = jnp.argsort(vox, stable=True)
    sv = vox[order]
    pos = jnp.arange(n)
    is_start = jnp.concatenate([jnp.ones((1,), bool), sv[1:] != sv[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0)
    )
    return jnp.zeros((n,), jnp.int32).at[order].set(
        (pos - seg_start).astype(jnp.int32)
    )


@partial(jax.jit, static_argnames=("out_size", "max_pts_per_voxel", "mode"))
def roiaware_pool3d(
    rois,
    pts,
    pts_feature,
    out_size=(4, 4, 4),
    max_pts_per_voxel: int = 128,
    mode: str = "max",
):
    """Args:
        rois: (N, 7) [cx, cy, cz(bottom), w, l, h, rz].
        pts: (npoints, 3).
        pts_feature: (npoints, C).
    Returns:
        (N, out_x, out_y, out_z, C) pooled features.
    """
    if isinstance(out_size, int):
        out_size = (out_size, out_size, out_size)
    nx, ny, nz = out_size
    V = nx * ny * nz
    C = pts_feature.shape[-1]
    N = rois.shape[0]

    vox = _voxel_ids(rois, pts, out_size)          # (N, npts)
    rank = jax.vmap(_rank_in_voxel)(vox)           # (N, npts)
    keep = (vox >= 0) & (rank < max_pts_per_voxel - 1)
    seg = jnp.where(keep, vox, V)                  # dropped -> overflow bucket

    if mode == "max":
        def pool_one(seg_row, keep_row):
            pooled = jax.ops.segment_max(
                jnp.where(keep_row[:, None], pts_feature, -jnp.inf),
                seg_row,
                num_segments=V + 1,
            )
            return jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    elif mode == "avg":
        def pool_one(seg_row, keep_row):
            total = jax.ops.segment_sum(
                pts_feature * keep_row[:, None], seg_row, num_segments=V + 1
            )
            cnt = jax.ops.segment_sum(
                keep_row.astype(pts_feature.dtype), seg_row, num_segments=V + 1
            )
            return total / jnp.maximum(cnt, 1.0)[:, None]
    else:
        raise ValueError(f"mode must be 'max' or 'avg', got {mode!r}")

    pooled = jax.vmap(pool_one)(seg, keep)          # (N, V+1, C)
    return pooled[:, :V].reshape(N, nx, ny, nz, C)
