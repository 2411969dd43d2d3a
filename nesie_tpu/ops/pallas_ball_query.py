"""Pallas TPU kernel for radius ball query with exact reference semantics.

The XLA formulation materializes (B, M, N) intermediates in HBM — the
distance/flag tensor, O(log N) associative-scan passes, and the
compare-sum read — ~122 ms at SA1 scale. This kernel keeps one batch
row's cloud VMEM-resident and fuses everything into a single pass:

  per tile of N: d2 (8, T) -> valid flags -> running count via a
  lower-triangular matmul on the MXU -> saturated count ``clipped`` ->
  per-k selection ``acc_k += sum_t [clipped_t < k]`` as a lanes-reduce of
  an (8, K, T) compare (VPU) -> early exit once every row in the group
  saturated at K+1 (no k can change after that).

Grid = (B, M/128); each cell handles 128 centers as 16 groups of 8
sublane rows. Semantics identical to ops.pointops.ball_query / the
reference CUDA kernel (ball_query_cuda.cu:36-53: first K in index order,
duplicate-fill with the first hit, zeros when no neighbor; d2 <= 0
always qualifies). Distances use the exact (a-b)^2 form — like the
reference CUDA kernel — so radius-boundary membership can differ from
the XLA path's matmul-form distances by float rounding.

(The first version of this kernel scattered slot ids through an
(8, T, K) one-hot contraction — 685 ms, VPU-bound with a bad layout.
The compare-sum selection with saturation early-exit replaced it.)
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
    sat = K + 1
    num_tiles = n // tile

    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    ).astype(jnp.float32)
    # ks along the sublane axis of the (8, K, T) compare: (1, K, 1)
    ks = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1) + 1
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, K), 1)

    n_groups = _CELL // _GROUP
    for g in range(n_groups):  # static unroll: dynamic sublane indexing
        cx = ctr_ref[0, 0, g, :, :]  # (8, 1)
        cy = ctr_ref[0, 1, g, :, :]
        cz = ctr_ref[0, 2, g, :, :]

        def tile_body(state):
            ti, acc, counts = state
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
            )  # inclusive running count within the tile, (GROUP, tile)
            clipped = jnp.minimum(
                counts + prefix.astype(jnp.int32), sat
            )  # (GROUP, tile), saturated total count at each position
            # acc_k += #(t : clipped_t < k); K rides the sublane axis so
            # the reduce is over lanes
            cmp = (clipped[:, None, :] < ks).astype(jnp.int32)  # (8, K, T)
            acc = acc + jnp.sum(cmp, axis=-1)
            counts = jnp.minimum(
                counts + prefix[:, -1:].astype(jnp.int32), sat
            )
            return ti + 1, acc, counts

        def tile_cond(state):
            ti, _, counts = state
            # once every row saturated, no k's count can change
            return (ti < num_tiles) & (jnp.min(counts) < sat)

        acc = jnp.zeros((_GROUP, K), jnp.int32)
        counts = jnp.zeros((_GROUP, 1), jnp.int32)
        ti, acc, counts = jax.lax.while_loop(
            tile_cond, tile_body, (0, acc, counts)
        )
        # rows that never saturated stopped at num_tiles with acc complete;
        # rows in a group that exited early are saturated, so their acc is
        # final too. idx == (position of k-th valid) or (ti * tile) == a
        # too-large sentinel when k > count — both cases are overwritten by
        # the fill rules below exactly like the N sentinel in the XLA path.
        idx = acc
        first = idx[:, 0:1]
        idx = jnp.where(slot_iota < counts, idx, first)  # duplicate-fill
        idx = jnp.where(counts > 0, idx, 0)              # no neighbor
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
