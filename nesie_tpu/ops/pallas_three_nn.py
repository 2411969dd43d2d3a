"""Pallas TPU kernel for 3-nearest-neighbor search.

Each grid cell computes distances for 128 queries against the whole
(VMEM-resident) source set as one (128, N) block and runs the three
min/argmin passes in registers — one HBM pass over the queries total.

Status: reachable through ops.three_nn via ``set_three_nn_impl``
('pallas'), OFF by default ('auto' = XLA). At B=8 quality-grid scale
(8 x 49152 queries vs 1024 sources) it is at parity with XLA (36.3 vs
36.7 ms on v5e) and at B=32 (81920 queries x 1024) it wins STANDALONE
(61.7 ms vs 96.7 ms) — but wiring it into the model forward measured
NET SLOWER (eval B=32: 266.0 vs 255.6 ms, tools/impl_ab.py r5): in
context XLA fuses the distance-matrix production into the argmin
consumers and the IDW weight math, so the standalone comparison
overstates its cost. Kept as a verified opt-in.

Semantics match ops.pointops.three_nn / the reference three_nn_cuda.cu
best1/2/3 linear scan: euclidean distances ascending, first index wins
ties. Distances use the exact (a-b)^2 form (the reference CUDA form);
index choice can differ from the XLA matmul-form path by float rounding
only when two sources are (near-)equidistant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CELL = 128


def _three_nn_kernel(src_ref, q_ref, dist_ref, idx_ref, *, n_real: int,
                     cell: int):
    """src_ref: (1, 3, N); q_ref: (1, 3, 1, CELL, 1);
    dist_ref/idx_ref: (1, CELL, 3)."""
    n = src_ref.shape[2]
    x = src_ref[0, 0, :].reshape(1, n)
    y = src_ref[0, 1, :].reshape(1, n)
    z = src_ref[0, 2, :].reshape(1, n)
    point_iota = jax.lax.broadcasted_iota(jnp.int32, (cell, n), 1)

    qx = q_ref[0, 0, 0, :, :]  # (CELL, 1)
    qy = q_ref[0, 1, 0, :, :]
    qz = q_ref[0, 2, 0, :, :]
    d2 = (x - qx) ** 2 + (y - qy) ** 2 + (z - qz) ** 2  # (CELL, N)

    dists, idxs = [], []
    for _ in range(3):
        mn = jnp.min(d2, axis=1, keepdims=True)          # (CELL, 1)
        eq = d2 == mn
        # first-index tie break, matching argmin
        i = jnp.min(
            jnp.where(eq, point_iota, n_real), axis=1, keepdims=True
        ).astype(jnp.int32)
        dists.append(mn)
        idxs.append(i)
        d2 = jnp.where(point_iota == i, jnp.float32(jnp.inf), d2)

    dist_ref[0] = jnp.sqrt(jnp.maximum(jnp.concatenate(dists, axis=1), 0.0))
    idx_ref[0] = jnp.concatenate(idxs, axis=1)


def three_nn_pallas(query, source, tile: int = 128, cell: int = _CELL):
    """(B, M, 3) queries x (B, N, 3) sources -> (dist (B, M, 3) f32,
    idx (B, M, 3) int32). M is padded to a multiple of ``cell`` internally;
    N to a multiple of ``tile`` with far-away points.

    ``cell`` = queries per grid cell: the kernel is per-cell-overhead
    bound at large M (see module docstring), so bigger cells amortize it
    — d2 is (cell, N) f32 in VMEM, keep cell*N under ~2M floats."""
    B, M, _ = query.shape
    N = source.shape[1]
    m_pad = (-M) % cell
    if m_pad:
        query = jnp.concatenate(
            [query, jnp.zeros((B, m_pad, 3), query.dtype)], axis=1
        )
    n_pad = (-N) % tile
    if n_pad:
        far = jnp.full((B, n_pad, 3), 1e9, source.dtype)
        source = jnp.concatenate([source, far], axis=1)
    Mp, Np = M + m_pad, N + n_pad

    src_t = jnp.swapaxes(source.astype(jnp.float32), 1, 2)  # (B, 3, N)
    q_t = jnp.swapaxes(query.astype(jnp.float32), 1, 2)
    q_t = q_t.reshape(B, 3, Mp // cell, cell, 1)
    kernel = functools.partial(_three_nn_kernel, n_real=N, cell=cell)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(B, Mp // cell),
        in_specs=[
            pl.BlockSpec((1, 3, Np), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 1, cell, 1),
                         lambda b, m: (b, 0, m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cell, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cell, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, Mp, 3), jnp.int32),
        ],
    )(src_t, q_t)
    return dist[:, :M], idx[:, :M]
