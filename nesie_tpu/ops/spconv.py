"""Sparse 3D convolution, XLA-native (reference mmdet3d/ops/spconv/: the
vendored spconv library — indice kernels, gather/scatter conv, sparse
maxpool). Present-but-unused by the shipped Nesie configs (SURVEY.md
section 2.1); provided for capability parity with static shapes.

Design: instead of the CUDA rulebook hash, voxel coordinates are
linearized and sorted once; each kernel offset finds its (input, output)
pairs with a binary search (jnp.searchsorted). Features move with
gather -> dense matmul (MXU) -> segment-sum scatter.

A SparseTensor is (features (V, C), coords (V, 3) int32 [z, y, x] or any
consistent order, valid (V,) bool) with a static voxel capacity V.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class SparseTensor(NamedTuple):
    features: jnp.ndarray  # (V, C)
    coords: jnp.ndarray    # (V, 3) int32
    valid: jnp.ndarray     # (V,) bool
    grid_shape: tuple      # static (D, H, W)


def _linear(coords, grid_shape):
    D, H, W = grid_shape
    return (coords[:, 0] * H + coords[:, 1]) * W + coords[:, 2]


def _kernel_offsets(kernel_size: int):
    r = np.arange(kernel_size) - (kernel_size - 1) // 2
    off = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    return jnp.asarray(off, jnp.int32)


def submanifold_conv3d(x: SparseTensor, weights, bias=None,
                       kernel_size: int = 3) -> SparseTensor:
    """SubMConv3d: output voxels == input voxels (reference conv.py
    SubMConv3d semantics).

    Args:
        weights: (k^3, C_in, C_out).
    """
    V = x.features.shape[0]
    D, H, W = x.grid_shape
    big = D * H * W
    lin = jnp.where(x.valid, _linear(x.coords, x.grid_shape), big)
    order = jnp.argsort(lin)
    sorted_lin = lin[order]

    offsets = _kernel_offsets(kernel_size)
    out = jnp.zeros((V, weights.shape[-1]), x.features.dtype)

    in_bounds_base = x.valid
    for k in range(offsets.shape[0]):
        # neighbor coordinate each output voxel reads from
        nb = x.coords - offsets[k]
        ok = (
            in_bounds_base
            & jnp.all(nb >= 0, axis=1)
            & (nb[:, 0] < D) & (nb[:, 1] < H) & (nb[:, 2] < W)
        )
        nb_lin = jnp.where(ok, _linear(nb, x.grid_shape), big + 1)
        pos = jnp.searchsorted(sorted_lin, nb_lin)
        pos = jnp.clip(pos, 0, V - 1)
        hit = ok & (sorted_lin[pos] == nb_lin)
        src = order[pos]
        gathered = x.features[src] * hit[:, None]
        out = out + jnp.dot(
            gathered, weights[k], preferred_element_type=out.dtype
        )
    if bias is not None:
        out = out + bias
    out = out * x.valid[:, None]
    return SparseTensor(out, x.coords, x.valid, x.grid_shape)


def sparse_conv3d(x: SparseTensor, weights, bias=None, kernel_size: int = 3,
                  stride: int = 2, max_out_voxels: int | None = None
                  ) -> SparseTensor:
    """Strided sparse conv (reference SparseConv3d): output sites are the
    distinct downsampled coords of the active inputs; each gathers its
    covered inputs.

    Args:
        weights: (k^3, C_in, C_out); max_out_voxels: static output capacity
            (defaults to the input capacity).
    """
    V = x.features.shape[0]
    Vout = max_out_voxels or V
    D, H, W = x.grid_shape
    Do, Ho, Wo = (D + stride - 1) // stride, (H + stride - 1) // stride, (W + stride - 1) // stride
    out_grid = (Do, Ho, Wo)
    big_out = Do * Ho * Wo

    # candidate output voxels: unique downsampled input coords
    down = x.coords // stride
    lin_out = jnp.where(x.valid, _linear(down, out_grid), big_out)
    uniq = jnp.unique(lin_out, size=Vout, fill_value=big_out)
    out_valid = uniq < big_out
    oz = uniq // (Ho * Wo)
    oy = (uniq // Wo) % Ho
    ox = uniq % Wo
    out_coords = jnp.stack([oz, oy, ox], axis=1).astype(jnp.int32)

    # sorted input table
    big_in = D * H * W
    lin_in = jnp.where(x.valid, _linear(x.coords, x.grid_shape), big_in)
    order = jnp.argsort(lin_in)
    sorted_lin = lin_in[order]

    offsets = _kernel_offsets(kernel_size)
    out = jnp.zeros((Vout, weights.shape[-1]), x.features.dtype)
    for k in range(offsets.shape[0]):
        nb = out_coords * stride + offsets[k] + (stride - 1) // 2
        ok = (
            out_valid
            & jnp.all(nb >= 0, axis=1)
            & (nb[:, 0] < D) & (nb[:, 1] < H) & (nb[:, 2] < W)
        )
        nb_lin = jnp.where(ok, _linear(nb, x.grid_shape), big_in + 1)
        pos = jnp.clip(jnp.searchsorted(sorted_lin, nb_lin), 0, V - 1)
        hit = ok & (sorted_lin[pos] == nb_lin)
        gathered = x.features[order[pos]] * hit[:, None]
        out = out + jnp.dot(gathered, weights[k], preferred_element_type=out.dtype)
    if bias is not None:
        out = out + bias
    out = out * out_valid[:, None]
    return SparseTensor(out, out_coords, out_valid, out_grid)


def _upsample_conv_core(x: SparseTensor, weights, out_coords, out_valid,
                        out_grid, kernel_size: int, stride: int, bias):
    """Shared gather core for inverse/transposed conv: fine-grid output site
    ``o`` reads coarse input ``q`` for kernel offset ``k`` iff the forward
    conv geometry (sparse_conv3d: in = q*stride + off_k + (stride-1)//2)
    linked them — i.e. q = (o - off_k - c) / stride exactly."""
    V = x.features.shape[0]
    D, H, W = x.grid_shape
    big_in = D * H * W
    lin_in = jnp.where(x.valid, _linear(x.coords, x.grid_shape), big_in)
    order = jnp.argsort(lin_in)
    sorted_lin = lin_in[order]

    c = (stride - 1) // 2
    offsets = _kernel_offsets(kernel_size)
    out = jnp.zeros((out_coords.shape[0], weights.shape[-1]), x.features.dtype)
    for k in range(offsets.shape[0]):
        t = out_coords - offsets[k] - c
        q = t // stride
        ok = (
            out_valid
            & jnp.all(t % stride == 0, axis=1)
            & jnp.all(q >= 0, axis=1)
            & (q[:, 0] < D) & (q[:, 1] < H) & (q[:, 2] < W)
        )
        q_lin = jnp.where(ok, _linear(q, x.grid_shape), big_in + 1)
        pos = jnp.clip(jnp.searchsorted(sorted_lin, q_lin), 0, V - 1)
        hit = ok & (sorted_lin[pos] == q_lin)
        gathered = x.features[order[pos]] * hit[:, None]
        out = out + jnp.dot(gathered, weights[k], preferred_element_type=out.dtype)
    if bias is not None:
        out = out + bias
    return out * out_valid[:, None]


def sparse_inverse_conv3d(x: SparseTensor, weights, ref: SparseTensor,
                          bias=None, kernel_size: int = 3, stride: int = 2
                          ) -> SparseTensor:
    """SparseInverseConv3d (reference conv.py:359-388): upsamples back to the
    active sites of the tensor that fed the matching strided conv, reusing
    that conv's (input, output) index pairs with the roles swapped.

    The reference stores the pairs in a dict keyed by ``indice_key``
    (conv.py SparseConvolution.forward + ops.get_indice_pairs); in this
    functional design the pre-downsample tensor ``ref`` is passed explicitly
    and the pairs are recomputed from the same geometry, which yields the
    identical rulebook.

    Args:
        weights: (k^3, C_in, C_out), kernel index in forward-conv order.
        ref: the SparseTensor that was the *input* of the strided conv
            whose downsampling this inverts (defines output sites + grid).
    """
    out = _upsample_conv_core(
        x, weights, ref.coords, ref.valid, ref.grid_shape,
        kernel_size, stride, bias,
    )
    return SparseTensor(out, ref.coords, ref.valid, ref.grid_shape)


def sparse_conv_transpose3d(x: SparseTensor, weights, bias=None,
                            kernel_size: int = 3, stride: int = 2,
                            max_out_voxels: int | None = None
                            ) -> SparseTensor:
    """SparseConvTranspose3d (reference conv.py:313-336): standalone
    transposed conv — output sites are every fine-grid site reachable from
    an active input through the kernel (no stored index pairs), on the
    stride-upsampled grid.
    """
    V = x.features.shape[0]
    Vout = max_out_voxels or V
    D, H, W = x.grid_shape
    out_grid = (D * stride, H * stride, W * stride)
    big_out = out_grid[0] * out_grid[1] * out_grid[2]
    c = (stride - 1) // 2

    # candidate output sites: q*stride + off + c over all offsets
    offsets = _kernel_offsets(kernel_size)
    cand = (
        x.coords[:, None, :] * stride + offsets[None, :, :] + c
    ).reshape(-1, 3)
    ok = (
        jnp.repeat(x.valid, offsets.shape[0])
        & jnp.all(cand >= 0, axis=1)
        & (cand[:, 0] < out_grid[0])
        & (cand[:, 1] < out_grid[1])
        & (cand[:, 2] < out_grid[2])
    )
    lin = jnp.where(ok, _linear(cand, out_grid), big_out)
    uniq = jnp.unique(lin, size=Vout, fill_value=big_out)
    out_valid = uniq < big_out
    oz = uniq // (out_grid[1] * out_grid[2])
    oy = (uniq // out_grid[2]) % out_grid[1]
    ox = uniq % out_grid[2]
    out_coords = jnp.stack([oz, oy, ox], axis=1).astype(jnp.int32)

    out = _upsample_conv_core(
        x, weights, out_coords, out_valid, out_grid, kernel_size, stride, bias
    )
    return SparseTensor(out, out_coords, out_valid, out_grid)


def sparse_maxpool3d(x: SparseTensor, stride: int = 2,
                     max_out_voxels: int | None = None) -> SparseTensor:
    """Sparse max pooling (reference src/maxpool_cuda.cu semantics)."""
    V = x.features.shape[0]
    Vout = max_out_voxels or V
    D, H, W = x.grid_shape
    out_grid = ((D + stride - 1) // stride, (H + stride - 1) // stride,
                (W + stride - 1) // stride)
    big_out = out_grid[0] * out_grid[1] * out_grid[2]

    down = x.coords // stride
    lin_out = jnp.where(x.valid, _linear(down, out_grid), big_out)
    uniq = jnp.unique(lin_out, size=Vout, fill_value=big_out)
    out_valid = uniq < big_out
    # map every input voxel to its output slot
    slot = jnp.clip(jnp.searchsorted(uniq, lin_out), 0, Vout - 1)
    hit = x.valid & (uniq[slot] == lin_out)
    neg = jnp.full((Vout, x.features.shape[1]), -jnp.inf, x.features.dtype)
    pooled = neg.at[jnp.where(hit, slot, Vout - 1)].max(
        jnp.where(hit[:, None], x.features, -jnp.inf)
    )
    pooled = jnp.where(jnp.isfinite(pooled), pooled, 0.0)
    oz = uniq // (out_grid[1] * out_grid[2])
    oy = (uniq // out_grid[2]) % out_grid[1]
    ox = uniq % out_grid[2]
    coords = jnp.stack([oz, oy, ox], axis=1).astype(jnp.int32)
    return SparseTensor(pooled * out_valid[:, None], coords, out_valid, out_grid)
