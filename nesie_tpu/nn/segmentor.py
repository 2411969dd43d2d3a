"""3D semantic segmentation (reference mmdet3d/models/segmentors/
encoder_decoder.py EncoderDecoder3D with a PointNet++ backbone — present
in the reference but unused by the shipped detection configs).

Structure mirrors the reference encoder-decoder: backbone -> decode head
(full FP chain back to every input point + per-point classifier), plus an
optional AUXILIARY head on an intermediate feature level used only for
deep supervision during training (encoder_decoder.py:16-18,96-111), and
sliding-window patch inference with overlap averaging
(encoder_decoder.py:186-333 ``_sliding_patch_generation``/
``slide_inference``).
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
    with_aux: bool = False  # auxiliary deep-supervision head

    @nn.compact
    def __call__(self, points, train: bool = False):
        """points (B, N, C_in) -> per-point logits (B, N, num_classes),
        or a dict with seg/aux logits when ``with_aux``."""
        feat = PointNet2SASSG(
            in_channels=self.in_channels,
            num_points=self.num_points,
            radii=self.radii,
            num_samples=self.num_samples,
            sa_channels=self.sa_channels,
            fp_channels=self.fp_channels[:-1],
            name="backbone",
        )(points, train=train)

        # decode head: final FP back to the full-resolution input points
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
        seg_logits = nn.Dense(self.num_classes, name="cls")(x)
        if not self.with_aux:
            return seg_logits

        # auxiliary head on the last intermediate FP level (deep
        # supervision only — thrown away at inference,
        # encoder_decoder.py:17-18)
        aux = PointMLP((self.head_channels,), bias=True, name="aux_head")(
            feat["fp_features"][-1], train=train
        )
        if self.dropout > 0:
            aux = nn.Dropout(self.dropout, deterministic=not train)(aux)
        aux_logits = nn.Dense(self.num_classes, name="aux_cls")(aux)
        return dict(
            seg_logits=seg_logits,
            aux_logits=aux_logits,
            aux_indices=feat["fp_indices"][-1],
        )


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


def encoder_decoder_loss(out, labels, aux_weight: float = 0.4,
                         ignore_index: int = 255, use_lovasz: bool = False):
    """Decode + auxiliary deep-supervision loss (reference
    encoder_decoder.py:119-149: ``decode.loss_ce`` + weighted aux losses;
    0.4 is the conventional mmseg auxiliary weight). Auxiliary labels are
    the input labels gathered at the intermediate level's point indices."""
    if not isinstance(out, dict):
        return segmentation_loss(out, labels, ignore_index, use_lovasz)
    loss = segmentation_loss(out["seg_logits"], labels, ignore_index,
                             use_lovasz)
    aux_labels = jnp.take_along_axis(labels, out["aux_indices"], axis=1)
    loss = loss + aux_weight * segmentation_loss(
        out["aux_logits"], aux_labels, ignore_index, use_lovasz
    )
    return loss


def slide_inference(points, apply_fn, num_points: int, block_size: float,
                    sample_rate: float = 0.5, batch_size: int = 4,
                    use_normalized_coord: bool = False, seed: int = 0,
                    eps: float = 1e-3):
    """Sliding-window patch inference with overlap averaging (reference
    encoder_decoder.py:186-333).

    Covers the scene with ``block_size`` x ``block_size`` BEV patches at
    stride ``block_size * sample_rate``; each patch's points are padded by
    random duplication to a multiple of ``num_points``, run through
    ``apply_fn`` in fixed-size batches, and the per-point logits are
    averaged over every patch occurrence (the reference's scatter-add +
    count normalization, :290-333).

    Args:
        points: (N, 3+C) numpy array — full scene.
        apply_fn: (B, num_points, D) -> (B, num_points, num_classes).
    Returns:
        (N, num_classes) numpy logits.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    points = np.asarray(points)
    coords, feats = points[:, :3], points[:, 3:]
    coord_max, coord_min = coords.max(0), coords.min(0)
    stride = block_size * sample_rate
    n_x = int(np.ceil(max(coord_max[0] - coord_min[0] - block_size, 0)
                      / stride)) + 1
    n_y = int(np.ceil(max(coord_max[1] - coord_min[1] - block_size, 0)
                      / stride)) + 1

    patch_points, patch_idxs = [], []
    for iy in range(n_y):
        e_y = min(coord_min[1] + iy * stride + block_size, coord_max[1])
        s_y = e_y - block_size
        for ix in range(n_x):
            e_x = min(coord_min[0] + ix * stride + block_size, coord_max[0])
            s_x = e_x - block_size
            cur_min = np.array([s_x, s_y, coord_min[2]])
            cur_max = np.array([e_x, e_y, coord_max[2]])
            choice = np.all(
                (coords >= cur_min - eps) & (coords <= cur_max + eps), axis=1
            )
            if not choice.any():
                continue
            idxs = np.nonzero(choice)[0]
            n_batch = int(np.ceil(len(idxs) / num_points))
            size = n_batch * num_points
            pad = rng.choice(idxs, size - len(idxs),
                             replace=size > 2 * len(idxs))
            idxs = rng.permutation(np.concatenate([idxs, pad]))
            center = cur_min + block_size / 2.0
            c = coords[idxs].copy()
            c[:, 0] -= center[0]
            c[:, 1] -= center[1]
            f = feats[idxs]
            if use_normalized_coord:
                f = np.concatenate([f, coords[idxs] / coord_max], axis=1)
            patch_points.append(
                np.concatenate([c, f], axis=1).reshape(n_batch, num_points, -1)
            )
            patch_idxs.append(idxs.reshape(n_batch, num_points))

    patch_points = np.concatenate(patch_points, 0)
    patch_idxs = np.concatenate(patch_idxs, 0)
    assert set(patch_idxs.ravel().tolist()) == set(range(len(points))), (
        "some points are not sampled in sliding inference"
    )

    logits_sum = None
    counts = np.zeros((len(points), 1), np.float32)
    for start in range(0, len(patch_points), batch_size):
        chunk = patch_points[start:start + batch_size]
        n_real = len(chunk)
        if n_real < batch_size:  # pad the tail batch to the static shape
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_size - n_real, 0)], 0
            )
        out = np.asarray(apply_fn(chunk))[:n_real]
        if logits_sum is None:
            logits_sum = np.zeros((len(points), out.shape[-1]), np.float32)
        for b in range(n_real):
            np.add.at(logits_sum, patch_idxs[start + b], out[b])
            np.add.at(counts, patch_idxs[start + b], 1.0)
    return logits_sum / np.maximum(counts, 1.0)
