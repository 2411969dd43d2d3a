"""Monocular single-stage 3D detector shell (reference
mmdet3d/models/detectors/single_stage_mono3d.py:14-221).

In the reference this class is pure dispatch scaffolding: the repo ships no
monocular head or image backbone (its ``bbox_head`` would come from external
upstream mmdet3d, e.g. FCOS3D), and no shipped config uses it. The parity
surface is therefore the *detector logic itself*:

  * ``forward_train`` -> backbone/neck feature extraction + head loss
    (single_stage_mono3d.py:26-68);
  * ``simple_test`` -> head forward + ``get_bboxes`` + per-image
    ``img_bbox`` result packing (:70-108);
  * ``aug_test`` -> the horizontal-flip test-time-augmentation merge
    (:110-178): flip every feature map back, remap the regression channels
    (offset_x -> 1-x, velo_x -> -velo_x, rot -> pi - rot), average the
    per-view maps, but keep the original view's rotation/velocity slice and
    direction-classification maps.

Backbone and head are injected flax modules, matching how the reference
builds them from registry config.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def flip_mono3d_outputs(cls_maps, reg_maps, extra_maps=None,
                        pred_velo: bool = False):
    """Undo a horizontal flip on dense mono3d head outputs.

    Args:
        cls_maps: list of (B, C, H, W) classification maps.
        reg_maps: list of (B, R, H, W) regression maps with the reference
            channel layout (0: offset_x, 6: rotation, 7: velo_x).
        extra_maps: optional list of further map lists (dir_cls, attr, ...).
    Returns:
        (cls_maps, reg_maps, extra_maps) flipped back to the original frame
        (single_stage_mono3d.py:117-133).
    """
    cls_maps = [jnp.flip(m, axis=3) for m in cls_maps]
    flipped_reg = []
    for m in reg_maps:
        m = jnp.flip(m, axis=3)
        m = m.at[:, 0].set(1.0 - m[:, 0])  # offset_x
        if pred_velo:
            m = m.at[:, 7].set(-m[:, 7])
        m = m.at[:, 6].set(-m[:, 6] + jnp.pi)  # rotation
        flipped_reg.append(m)
    if extra_maps is not None:
        extra_maps = [
            None if ms is None else [jnp.flip(m, axis=3) for m in ms]
            for ms in extra_maps
        ]
    return cls_maps, flipped_reg, extra_maps


def merge_aug_mono3d_outputs(outs_list):
    """Average per-view dense outputs, reference merge semantics
    (single_stage_mono3d.py:136-157): every output group is averaged
    across views, except regression maps (group 1) keep view 0's
    rot/velo/bbox2d channels (>= 6) and the dir_cls group (group 2,
    exactly that one) keeps view 0 wholesale; later groups (attr,
    centerness, ...) are averaged like the classification maps.

    Args:
        outs_list: list over views of (cls_maps, reg_maps, *extra) tuples,
            each a list over featmap strides.
    Returns:
        one merged (cls_maps, reg_maps, *extra) tuple.
    """
    first = outs_list[0]
    merged = []
    for i, group in enumerate(first):
        if group is None or (group and group[0] is None):
            merged.append(group)
            continue
        maps = []
        for j, ref_map in enumerate(group):
            if i == 2:  # dir_cls keeps the original view (and only it)
                maps.append(ref_map)
                continue
            avg = jnp.mean(
                jnp.stack([outs[i][j] for outs in outs_list]), axis=0)
            if i == 1:  # regression: rot/velo/2d keep the original view
                avg = avg.at[:, 6:].set(ref_map[:, 6:])
            maps.append(avg)
        merged.append(maps)
    return tuple(merged)


class SingleStageMono3DDetector(nn.Module):
    """Backbone(+neck) -> dense mono3d head, functional dispatch.

    Attributes:
        backbone / neck / bbox_head: flax modules. The head must expose
        ``__call__(feats) -> outs`` and, for the host-side decode,
        ``get_bboxes(outs, img_metas)`` following the reference protocol.
    """

    backbone: nn.Module
    bbox_head: nn.Module
    neck: Optional[nn.Module] = None

    def extract_feat(self, img, train: bool = False):
        x = self.backbone(img, train=train)
        if self.neck is not None:
            x = self.neck(x, train=train)
        return x

    def __call__(self, img, train: bool = False):
        """Dense head outputs for one image batch (N, H, W, C)."""
        return self.bbox_head(self.extract_feat(img, train=train),
                              train=train)

    def forward_train(self, img, targets, train: bool = True):
        """Head loss dict (the reference delegates everything to
        ``bbox_head.forward_train``, single_stage_mono3d.py:63-68)."""
        feats = self.extract_feat(img, train=train)
        return self.bbox_head.loss(feats, targets, train=train)
