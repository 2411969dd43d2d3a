"""3D anchor generation (reference mmdet3d/core/anchor/
anchor_3d_generator.py Anchor3DRangeGenerator — parity for anchor-based
heads; the VoteNet family is anchor-free)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def anchor_3d_range_grid(
    feature_size: Sequence[int],
    anchor_range: Sequence[float],
    sizes: Sequence[Sequence[float]] = ((1.6, 3.9, 1.56),),
    rotations: Sequence[float] = (0.0, 1.5707963),
):
    """Dense anchors over a BEV grid.

    Args:
        feature_size: (D, H, W) grid resolution (D usually 1).
        anchor_range: (x0, y0, z0, x1, y1, z1).
    Returns:
        (D*H*W*len(sizes)*len(rotations), 7) anchors.
    """
    D, H, W = feature_size
    x0, y0, z0, x1, y1, z1 = anchor_range
    xs = jnp.linspace(x0, x1, W)
    ys = jnp.linspace(y0, y1, H)
    zs = jnp.linspace(z0, z1, D)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    centers = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # (G, 3)

    sizes = jnp.asarray(sizes, jnp.float32)      # (S, 3)
    rots = jnp.asarray(rotations, jnp.float32)   # (R,)
    G, S, R = centers.shape[0], sizes.shape[0], rots.shape[0]

    c = jnp.broadcast_to(centers[:, None, None], (G, S, R, 3))
    s = jnp.broadcast_to(sizes[None, :, None], (G, S, R, 3))
    r = jnp.broadcast_to(rots[None, None, :], (G, S, R))[..., None]
    return jnp.concatenate([c, s, r], axis=-1).reshape(-1, 7)
