"""3D semantic segmentation (reference mmdet3d/models/segmentors/
encoder_decoder.py EncoderDecoder3D with a PointNet++ backbone — present
in the reference but unused by the shipped detection configs).

A full FP chain propagates features back to every input point; a small
per-point head predicts class logits.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import PointMLP
from .pointnet2 import PointFPModule, PointNet2SASSG


class PointNet2Segmentor(nn.Module):
    """Encoder-decoder semantic segmentation over point clouds."""

    num_classes: int = 20
    in_channels: int = 4
    num_points: Sequence[int] = (1024, 256, 64, 16)
    radii: Sequence[float] = (0.1, 0.2, 0.4, 0.8)
    num_samples: Sequence[int] = (32, 32, 32, 32)
    sa_channels: Sequence[Sequence[int]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512),
    )
    fp_channels: Sequence[Sequence[int]] = (
        (256, 256), (256, 256), (256, 128), (128, 128, 128),
    )
    head_channels: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, C_in) -> per-point logits (B, N, num_classes)."""
        feat = PointNet2SASSG(
            in_channels=self.in_channels,
            num_points=self.num_points,
            radii=self.radii,
            num_samples=self.num_samples,
            sa_channels=self.sa_channels,
            fp_channels=self.fp_channels[:-1],
            name="backbone",
        )(points, train=train)

        # final FP back to the full-resolution input points
        full = PointFPModule(self.fp_channels[-1], name="fp_final")(
            feat["sa_xyz"][0],
            feat["fp_xyz"][-1],
            feat["sa_features"][0],
            feat["fp_features"][-1],
            train=train,
        )
        x = PointMLP((self.head_channels,), bias=True, name="head")(
            full, train=train
        )
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="cls")(x)


def segmentation_loss(logits, labels, ignore_index: int = 255,
                      use_lovasz: bool = False):
    """Per-point CE (+ optional lovasz-softmax) with an ignore label."""
    import jax

    from nesie_tpu.losses import softmax_cross_entropy
    from nesie_tpu.losses.consistency import lovasz_softmax

    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ce = softmax_cross_entropy(logits, safe) * valid
    loss = jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1.0)
    if use_lovasz:
        probs = jax.nn.softmax(logits, axis=-1).reshape(-1, logits.shape[-1])
        loss = loss + lovasz_softmax(
            probs, safe.reshape(-1), logits.shape[-1]
        )
    return loss
