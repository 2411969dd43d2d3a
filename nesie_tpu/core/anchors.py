"""3D anchor generation (reference
mmdet3d/core/anchor/anchor_3d_generator.py: Anchor3DRangeGenerator:8,
AlignedAnchor3DRangeGenerator:213, AlignedAnchor3DRangeGeneratorPerCls:329).

Parity components for anchor-based heads — the VoteNet family is
anchor-free, so nothing in the Nesie path consumes these. Semantics
(meshgrid order, permute to (D, H, W, S, R, 7), per-size ranges, aligned
half-cell shift, zero-filled custom values) follow the reference exactly;
the implementation is plain vectorized jnp instead of torch tile/permute
gymnastics.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def _single_range(feature_size, anchor_range, scale, sizes, rotations,
                  aligned: bool, align_corner: bool):
    """Anchors for one (range, sizes) pair.

    Returns (D, H, W, S, R, 7) like the reference's ``anchors_single_range``
    (anchor_3d_generator.py:147-211 plain / :243-328 aligned).
    """
    if len(feature_size) == 2:
        feature_size = (1, *feature_size)
    D, H, W = (int(v) for v in feature_size)
    r = jnp.asarray(anchor_range, jnp.float32)

    def centers(lo, hi, n):
        if not aligned:
            return jnp.linspace(lo, hi, n)
        edges = jnp.linspace(lo, hi, n + 1)
        if align_corner:
            return edges[:n]
        return edges[:n] + (edges[1] - edges[0]) / 2

    zs = centers(r[2], r[5], D)
    ys = centers(r[1], r[4], H)
    xs = centers(r[0], r[3], W)
    sizes = jnp.asarray(sizes, jnp.float32).reshape(-1, 3) * scale
    rots = jnp.asarray(rotations, jnp.float32)
    S, R = sizes.shape[0], rots.shape[0]

    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")  # (D, H, W)
    grid = jnp.stack([xx, yy, zz], axis=-1)               # (D, H, W, 3)
    out = jnp.concatenate(
        [
            jnp.broadcast_to(grid[:, :, :, None, None], (D, H, W, S, R, 3)),
            jnp.broadcast_to(sizes[None, None, None, :, None], (D, H, W, S, R, 3)),
            jnp.broadcast_to(rots[None, None, None, None, :, None], (D, H, W, S, R, 1)),
        ],
        axis=-1,
    )
    return out


class Anchor3DRangeGenerator:
    """Range-based dense anchors (anchor_3d_generator.py:8-211)."""

    aligned = False

    def __init__(
        self,
        ranges: Sequence[Sequence[float]],
        sizes: Sequence[Sequence[float]] = ((1.6, 3.9, 1.56),),
        scales: Sequence[float] = (1,),
        rotations: Sequence[float] = (0, 1.5707963),
        custom_values: Sequence[float] = (),
        reshape_out: bool = True,
        size_per_range: bool = True,
        align_corner: bool = False,
    ):
        ranges = [list(r) for r in ranges]
        if size_per_range:
            if len(sizes) != len(ranges):
                assert len(ranges) == 1
                ranges = ranges * len(sizes)
            assert len(ranges) == len(sizes)
        else:
            assert len(ranges) == 1
        self.ranges = ranges
        self.sizes = [list(s) for s in sizes]
        self.scales = list(scales)
        self.rotations = list(rotations)
        self.custom_values = tuple(custom_values)
        self.reshape_out = reshape_out
        self.size_per_range = size_per_range
        self.align_corner = align_corner

    @property
    def num_base_anchors(self):
        return len(self.sizes) * len(self.rotations)

    @property
    def num_levels(self):
        return len(self.scales)

    def _with_custom(self, anchors):
        if not self.custom_values:
            return anchors
        pad = jnp.zeros(
            anchors.shape[:-1] + (len(self.custom_values),), anchors.dtype
        )  # reference leaves the custom columns zeroed (:204-209)
        return jnp.concatenate([anchors, pad], axis=-1)

    def single_level_grid_anchors(self, featmap_size, scale):
        """(D, H, W, S_total, R, 7+custom) for one feature level."""
        if not self.size_per_range:
            a = _single_range(featmap_size, self.ranges[0], scale, self.sizes,
                              self.rotations, self.aligned, self.align_corner)
            return self._with_custom(a)
        per = [
            _single_range(featmap_size, rng, scale, [size], self.rotations,
                          self.aligned, self.align_corner)
            for rng, size in zip(self.ranges, self.sizes)
        ]
        return self._with_custom(jnp.concatenate(per, axis=-3))

    def grid_anchors(self, featmap_sizes):
        """Anchors per level; flattened to (N, 7+custom) if reshape_out."""
        assert self.num_levels == len(featmap_sizes)
        out = []
        for i in range(self.num_levels):
            a = self.single_level_grid_anchors(featmap_sizes[i], self.scales[i])
            out.append(a.reshape(-1, a.shape[-1]) if self.reshape_out else a)
        return out


class AlignedAnchor3DRangeGenerator(Anchor3DRangeGenerator):
    """Voxel-aligned variant (anchor_3d_generator.py:213-328): centers sit
    at cell centers of an (N+1)-edge grid (or corners if align_corner)."""

    aligned = True


class AlignedAnchor3DRangeGeneratorPerCls(AlignedAnchor3DRangeGenerator):
    """Per-class featmap sizes in one level (anchor_3d_generator.py:329-403)."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        assert len(self.scales) == 1, (
            "multi-scale levels unsupported for per-class anchors"
        )

    def grid_anchors(self, featmap_sizes):
        return [self.multi_cls_grid_anchors(featmap_sizes, self.scales[0])]

    def multi_cls_grid_anchors(self, featmap_sizes, scale):
        """Per class c: (S_c*R*prod(featmap_sizes[c]), 7+custom), anchors
        ordered base-anchor-major (reference permute, :366-403)."""
        assert len(featmap_sizes) == len(self.sizes) == len(self.ranges)
        out = []
        for fs, rng, size in zip(featmap_sizes, self.ranges, self.sizes):
            a = _single_range(fs, rng, scale, size, self.rotations,
                              self.aligned, self.align_corner)
            a = self._with_custom(a)
            code = a.shape[-1]
            ndim = len(fs)
            a = a.reshape(*fs, -1, code)           # (*fs, S*R, code)
            a = jnp.moveaxis(a, ndim, 0)           # (S*R, *fs, code)
            out.append(a.reshape(-1, code))
        return out


def anchor_3d_range_grid(
    feature_size: Sequence[int],
    anchor_range: Sequence[float],
    sizes: Sequence[Sequence[float]] = ((1.6, 3.9, 1.56),),
    rotations: Sequence[float] = (0.0, 1.5707963),
):
    """Flat convenience wrapper: dense (D*H*W*S*R, 7) anchors over a range
    (plain, non-aligned convention)."""
    a = _single_range(feature_size, anchor_range, 1.0, sizes, rotations,
                      aligned=False, align_corner=False)
    return a.reshape(-1, 7)
