"""Pallas TPU kernel for radius ball query with exact reference semantics.

The XLA formulation materializes a (B, M, N) distance/prefix tensor in HBM
(~400 ms at SA1 scale). This kernel streams the N source points through
VMEM in tiles and fills each center's K slots in source-index order:

  per tile: d2 (RM, T) -> valid -> within-tile running count via a
  lower-triangular matmul on the MXU -> slot ids -> scatter into the
  (RM, K) output with a one-hot batched matmul (indices ride as f32;
  N < 2^24 so the accumulation is exact).

Semantics identical to ops.pointops.ball_query / the reference CUDA kernel
(first K in index order, duplicate-fill with the first hit, zeros when no
neighbor; d2 <= 0 always qualifies).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bq_kernel(xyz_ref, ctr_ref, out_ref, count_ref,
               *, num_samples: int, max_r2: float, min_r2: float,
               tile: int, rows: int):
    """Grid cell = (batch row, RM-center block).

    xyz_ref: (1, 3, N); ctr_ref: (1, 3, RM); out_ref: (1, RM, K) int32;
    count_ref: (1, RM) int32 scratch-like output of hit counts.
    """
    n = xyz_ref.shape[2]
    K = num_samples
    num_tiles = n // tile

    cx = ctr_ref[0, 0, :].reshape(rows, 1)
    cy = ctr_ref[0, 1, :].reshape(rows, 1)
    cz = ctr_ref[0, 2, :].reshape(rows, 1)

    tri = (
        jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 0)
        <= jax.lax.broadcasted_iota(jnp.float32, (tile, tile), 1)
    ).astype(jnp.float32)  # lower-tri^T: prefix[t] = sum_{s<=t} ok[s]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, tile, K), 2)

    def body(ti, state):
        acc, counts = state  # acc (rows, K) f32, counts (rows, 1) f32
        sl = pl.ds(ti * tile, tile)
        x = xyz_ref[0, 0, sl].reshape(1, tile)
        y = xyz_ref[0, 1, sl].reshape(1, tile)
        z = xyz_ref[0, 2, sl].reshape(1, tile)
        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (rows, tile)
        ok = (d2 <= 0.0) | ((d2 >= min_r2) & (d2 < max_r2))
        okf = ok.astype(jnp.float32)
        # inclusive running count within the tile (MXU)
        prefix = jax.lax.dot_general(
            okf, tri, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, tile)
        slots = counts + prefix - 1.0  # (rows, tile), value when ok
        write = ok & (slots >= 0) & (slots < K)
        slots_i = slots.astype(jnp.int32)
        onehot = (
            (k_iota == slots_i[:, :, None]) & write[:, :, None]
        ).astype(jnp.float32)  # (rows, tile, K)
        idx_vals = (
            jax.lax.broadcasted_iota(jnp.float32, (1, tile), 1)
            + jnp.float32(ti * tile)
        )  # global source indices as f32
        contrib = jnp.sum(idx_vals[:, :, None] * onehot, axis=1)  # (rows, K)
        acc = acc + contrib
        counts = counts + prefix[:, -1:].astype(jnp.float32)
        return acc, counts

    acc = jnp.zeros((rows, K), jnp.float32)
    counts = jnp.zeros((rows, 1), jnp.float32)
    acc, counts = jax.lax.fori_loop(0, num_tiles, body, (acc, counts))

    cnt = counts.astype(jnp.int32)  # (rows, 1)
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, K), 1)
    idx = acc.astype(jnp.int32)
    first = idx[:, 0:1]
    idx = jnp.where(slot_iota < cnt, idx, first)  # duplicate-fill
    idx = jnp.where(cnt > 0, idx, 0)
    out_ref[0] = idx
    count_ref[0] = cnt[:, 0]


def ball_query_pallas(xyz, centers, radius: float, num_samples: int,
                      min_radius: float = 0.0, tile: int = 1024,
                      rows: int = 8):
    """(B, N, 3) x (B, M, 3) -> (B, M, K) int32; M % rows == 0.

    N is padded up to a multiple of ``tile`` with far-away points (their
    distances never qualify, and padded indices are > any real index so
    the in-order fill is unaffected). Keep ``tile^2 * 4`` well under VMEM
    (tile=1024 -> 4 MB triangular matrix).
    """
    B, N, _ = xyz.shape
    M = centers.shape[1]
    assert M % rows == 0
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
        rows=rows,
    )
    xyz_t = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)      # (B, 3, N)
    ctr_t = jnp.swapaxes(centers.astype(jnp.float32), 1, 2)  # (B, 3, M)
    out, _ = pl.pallas_call(
        kernel,
        grid=(B, M // rows),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, rows), lambda b, m: (b, 0, m),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, num_samples), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows), lambda b, m: (b, m),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, M, num_samples), jnp.int32),
            jax.ShapeDtypeStruct((B, M), jnp.int32),
        ),
    )(xyz_t, ctr_t)
    return out
