"""Pallas TPU kernel for radius ball query with exact reference semantics.

The XLA formulation materializes a (B, M, N) distance/prefix tensor in HBM
(~400 ms at SA1 scale). This kernel keeps the cloud VMEM-resident and
streams it in tiles per center group:

  per tile: d2 (8, T) -> valid -> within-tile running count via a
  lower-triangular matmul on the MXU -> slot ids -> scatter into the
  (8, K) output with a one-hot contraction (indices ride as f32;
  N < 2^24 so the accumulation is exact).

Grid = (B, M/128); each cell handles 128 centers as 16 groups of 8
sublane rows (TPU block shapes want 128 lanes). Semantics identical to
ops.pointops.ball_query / the reference CUDA kernel (first K in index
order, duplicate-fill with the first hit, zeros when no neighbor;
d2 <= 0 always qualifies). Distances use the exact (a-b)^2 form — like
the reference CUDA kernel — so radius-boundary membership can differ from
the XLA path's matmul-form distances by float rounding.

Status: semantics verified (interpret mode); measured 685 ms at SA1 scale
on v5e — slower than the XLA searchsorted path (395 ms) because the
(8, tile, K) one-hot scatter is VPU-bound. Kept for future optimization
(per-k min-scan or larger row blocks); ops.set_ball_query_impl defaults
to 'xla'.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_GROUP = 8      # center rows per inner step (sublanes)
_CELL = 128     # centers per grid cell (lanes)


def _bq_kernel(xyz_ref, ctr_ref, out_ref,
               *, num_samples: int, max_r2: float, min_r2: float,
               tile: int):
    """xyz_ref: (1, 3, N); ctr_ref: (1, 3, CELL/8, 8, 1) — the center
    coords arrive pre-shaped so each group reads as a native (8, 1)
    sublane column (Mosaic can't relayout lanes->sublanes in-kernel);
    out_ref: (1, CELL, K)."""
    n = xyz_ref.shape[2]
    K = num_samples
    num_tiles = n // tile

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    ).astype(jnp.float32)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, tile, K), 2)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, K), 1)

    n_groups = _CELL // _GROUP
    for g in range(n_groups):  # static unroll: dynamic sublane indexing
        cx = ctr_ref[0, 0, g, :, :]  # (8, 1)
        cy = ctr_ref[0, 1, g, :, :]
        cz = ctr_ref[0, 2, g, :, :]

        def tile_body(ti, state):
            acc, counts = state
            sl = pl.ds(ti * tile, tile)
            x = xyz_ref[0, 0, sl].reshape(1, tile)
            y = xyz_ref[0, 1, sl].reshape(1, tile)
            z = xyz_ref[0, 2, sl].reshape(1, tile)
            d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2
            ok = (d2 <= 0.0) | ((d2 >= min_r2) & (d2 < max_r2))
            okf = ok.astype(jnp.float32)
            prefix = jax.lax.dot_general(
                okf, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # inclusive running count (GROUP, tile)
            slots = counts + prefix - 1.0
            write = ok & (slots >= 0) & (slots < K)
            # cast to 32-bit BEFORE adding the minor dim (Mosaic only
            # broadcasts 32-bit types into new minor dims)
            writef = write.astype(jnp.float32)
            onehot = (
                (k_iota == slots.astype(jnp.int32)[:, :, None])
            ).astype(jnp.float32) * writef[:, :, None]
            idx_vals = (
                jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
                + ti * tile
            ).astype(jnp.float32)
            acc = acc + jnp.sum(idx_vals[:, :, None] * onehot, axis=1)
            counts = counts + prefix[:, -1:]
            return acc, counts

        acc = jnp.zeros((_GROUP, K), jnp.float32)
        counts = jnp.zeros((_GROUP, 1), jnp.float32)
        acc, counts = jax.lax.fori_loop(0, num_tiles, tile_body, (acc, counts))

        cnt = counts.astype(jnp.int32)
        idx = acc.astype(jnp.int32)
        first = idx[:, 0:1]
        idx = jnp.where(slot_iota < cnt, idx, first)
        idx = jnp.where(cnt > 0, idx, 0)
        out_ref[0, g * _GROUP : (g + 1) * _GROUP, :] = idx


def ball_query_pallas(xyz, centers, radius: float, num_samples: int,
                      min_radius: float = 0.0, tile: int = 1024):
    """(B, N, 3) x (B, M, 3) -> (B, M, K) int32; M % 128 == 0.

    N is padded up to a multiple of ``tile`` with far-away points (their
    distances never qualify, and padded indices exceed every real index so
    the in-order fill is unaffected). Keep ``tile^2 * 4`` well under VMEM
    (tile=1024 -> 4 MB triangular matrix).
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    assert M % _CELL == 0, f"M={M} must be a multiple of {_CELL}"
    if N % tile:
        pad = tile - N % tile
        far = jnp.full((B, pad, 3), 1e9, xyz.dtype)
        xyz = jnp.concatenate([xyz, far], axis=1)
        N = N + pad
    kernel = functools.partial(
        _bq_kernel,
        num_samples=num_samples,
        max_r2=radius * radius,
        min_r2=min_radius * min_radius,
        tile=tile,
    )
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # (B, 3, N)
    ctr_t = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)  # (B, 3, M)
    ctr_t = ctr_t.reshape(B, 3, M // _GROUP, _GROUP, 1)
    n_cell_groups = _CELL // _GROUP
    return pl.pallas_call(
        kernel,
        grid=(B, M // _CELL),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_cell_groups, _GROUP, 1),
                         lambda b, m: (b, 0, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CELL, num_samples), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, M, num_samples), jnp.int32),
    )(xyz_t, ctr_t)
