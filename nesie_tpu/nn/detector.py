"""Detector assembly: PointNet++ backbone + Nesie head.

Reference: mmdet3d/models/detectors/votenet.py (supervised VoteNet with a
NesieHead) and single_stage.py:53 (extract_feat). The semi-supervised
wrapper (VoteNetNesie) lives in nesie_tpu/train/semi.py — in JAX the
teacher is just the EMA params pytree applied to this same module.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .nesie_head import NesieHead
from .pointnet2 import PointNet2SASSG
from .saqe_head import SAQEHead


class VoteNetNesie(nn.Module):
    """Backbone + head forward. Returns the head results dict.

    ``head='nesie'`` gives the ICCV'23 NesieHead; ``head='saqe'`` the
    journal SAQEHead (reference VoteNetSAQE detector)."""

    num_classes: int = 18
    reg_max: int = 32
    num_proposal: int = 256
    in_channels: int = 4
    head: str = "nesie"
    dataset_name: str = "ScanNet"
    sizes: Sequence[float] = (3.0, 3.0, 2.5)
    # backbone overrides (tiny configs for tests)
    num_points: Sequence[int] = (2048, 1024, 512, 256)
    radii: Sequence[float] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Sequence[int] = (64, 32, 16, 16)
    sa_channels: Sequence[Sequence[int]] = (
        (64, 64, 128),
        (128, 128, 256),
        (128, 128, 256),
        (128, 128, 256),
    )
    fp_channels: Sequence[Sequence[int]] = ((256, 256), (256, 256))
    jitter_scale: float = 0.3
    jitter_size_bias: float = 0.0
    compute_dtype: str | None = None  # "bfloat16" runs backbone MLPs in bf16

    @property
    def seed_feat_dim(self) -> int:
        return self.fp_channels[-1][-1]

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        self.backbone = PointNet2SASSG(
            in_channels=self.in_channels,
            num_points=self.num_points,
            radii=self.radii,
            num_samples=self.num_samples,
            sa_channels=self.sa_channels,
            fp_channels=self.fp_channels,
            compute_dtype=self._dtype,
        )
        common = dict(
            num_classes=self.num_classes,
            reg_max=self.reg_max,
            num_proposal=self.num_proposal,
            seed_feat_dim=self.seed_feat_dim,
            vote_conv_channels=(self.seed_feat_dim, self.seed_feat_dim),
            dataset_name=self.dataset_name,
            jitter_scale=self.jitter_scale,
            jitter_size_bias=self.jitter_size_bias,
        )
        if self.head == "saqe":
            self.bbox_head = SAQEHead(**common)
        else:
            self.bbox_head = NesieHead(sizes=self.sizes, **common)

    def __call__(self, points, sample_mod: str, rng, train: bool = False,
                 with_jitter: bool = True):
        """points: (B, N, in_channels). Returns head results dict.
        ``with_jitter=False`` is the eval fast path (see NesieHead)."""
        feat_dict = self.backbone(points, train=train)
        return self.bbox_head(feat_dict, sample_mod, rng, train=train,
                              with_jitter=with_jitter)

    def quality_scores(self, results, center, size, heading):
        """Re-run only the quality module on explicit box parameters
        (reference forward_onlyiou_faster, nesie_head.py:790): returns the
        per-proposal IoU score at the semantic-argmax class, (B, K)."""
        out = self.bbox_head.grid_conv(
            center,
            size,
            heading,
            results["seed_points"],
            results["seed_features"],
            results["bbox_probs"],
            train=False,
        )
        iou_scores = jax.nn.sigmoid(out[1])  # (side, iou, ...) for both heads
        sem_argmax = jnp.argmax(results["sem_scores"], axis=-1)
        return jnp.take_along_axis(iou_scores, sem_argmax[..., None], axis=-1)[
            ..., 0
        ]
