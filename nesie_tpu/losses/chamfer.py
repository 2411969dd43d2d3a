"""Chamfer distance with argmin indices (reference
mmdet3d/models/losses/chamfer_distance.py:8), plus masked-target support
for static GT padding."""
from __future__ import annotations

import jax.numpy as jnp

from .basic import l1_loss, mse_loss, smooth_l1_loss

_CRITERIA = {"l1": l1_loss, "l2": mse_loss, "smooth_l1": smooth_l1_loss}


def chamfer_distance(
    src,
    dst,
    src_weight=1.0,
    dst_weight=1.0,
    mode: str = "l2",
    dst_valid=None,
):
    """Bidirectional nearest-point distances.

    Args:
        src: (B, N, C); dst: (B, M, C).
        dst_valid: optional (B, M) bool — when given, invalid dst rows are
            excluded from the src->dst argmin (used for assignment against
            padded GT arrays; the reference computes assignment before
            padding, nesie_head.py:658). The dst->src direction is *not*
            masked (invalid rows get weighted out by dst_weight instead,
            matching the reference's padded-center chamfer loss).
    Returns:
        (loss_src (B, N), loss_dst (B, M), idx_src (B, N), idx_dst (B, M)).
    """
    crit = _CRITERIA[mode]
    diff = crit(src[:, :, None, :], dst[:, None, :, :])  # (B, N, M, C)
    distance = jnp.sum(diff, axis=-1)  # (B, N, M)

    d_for_src = distance
    if dst_valid is not None:
        big = jnp.asarray(jnp.inf, distance.dtype)
        masked = jnp.where(dst_valid[:, None, :], distance, big)
        # all-invalid row: fall back to unmasked (reference inserts a fake
        # zero box for empty scenes; padded slot 0 *is* that zero box)
        any_valid = jnp.any(dst_valid, axis=-1)[:, None, None]
        d_for_src = jnp.where(any_valid, masked, distance)

    src2dst = jnp.min(d_for_src, axis=2)
    idx_src = jnp.argmin(d_for_src, axis=2)
    dst2src = jnp.min(distance, axis=1)
    idx_dst = jnp.argmin(distance, axis=1)

    return src2dst * src_weight, dst2src * dst_weight, idx_src, idx_dst
