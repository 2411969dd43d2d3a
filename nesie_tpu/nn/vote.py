"""Deep Hough voting module (reference mmdet3d/models/model_utils/vote_module.py)."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import PointMLP


class VoteModule(nn.Module):
    """Per-seed vote offsets + residual features.

    vote = seed_xyz + predicted offset; vote feature = seed feature +
    predicted residual, optionally L2-normalized over channels
    (vote_module.py:142-144).
    """

    in_channels: int = 256
    vote_per_seed: int = 1
    gt_per_seed: int = 3
    conv_channels: Sequence[int] = (256, 256)
    norm_feats: bool = True
    with_res_feat: bool = True

    @nn.compact
    def __call__(self, seed_xyz, seed_feats, train: bool = False):
        """seed_xyz: (B, N, 3); seed_feats: (B, N, C).

        Returns vote_xyz (B, N*v, 3), vote_feats (B, N*v, C),
        offset (B, N*v, 3).
        """
        assert self.vote_per_seed == 1, "vote_per_seed>1 not needed by any config"
        x = PointMLP(self.conv_channels, bias=True, name="trunk")(
            seed_feats, train=train
        )
        out_dim = (3 + self.in_channels) if self.with_res_feat else 3
        votes = nn.Dense(out_dim * self.vote_per_seed, name="out")(x)

        offset = votes[..., :3]
        vote_xyz = seed_xyz + offset
        if self.with_res_feat:
            vote_feats = seed_feats + votes[..., 3:]
            if self.norm_feats:
                norm = jnp.linalg.norm(vote_feats, axis=-1, keepdims=True)
                vote_feats = vote_feats / jnp.maximum(norm, 1e-12)
        else:
            vote_feats = seed_feats
        return vote_xyz, vote_feats, offset
