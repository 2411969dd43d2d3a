"""Position-adaptive convolution (reference mmdet3d/ops/paconv/: PAConv +
the assign_score_withk CUDA kernel). Present-but-unused parity op.

PAConv computes per-neighbor convolution weights as a soft mixture of a
learned weight bank: ScoreNet maps relative position -> (K, M) scores,
output = sum_m score_m * (feat @ W_m). The CUDA ``assign_score_withk``
fused gather+mix becomes one einsum on the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def assign_score_withk(scores, point_feats, center_feats, knn_idx):
    """Fused score-weighted feature mixing (reference
    paconv/src/assign_score_withk_cuda.cu, aggregate='sum').

    Args:
        scores: (B, N, K, M) mixing scores over M weight-bank outputs.
        point_feats: (B, Npoint, M, C) per-point features already multiplied
            by each bank matrix.
        center_feats: (B, Npoint, M, C) same for the centers.
        knn_idx: (B, N, K) neighbor indices into Npoint.
    Returns:
        (B, N, K, C): score-mixed (neighbor - center) features.
    """
    B, N, K, M = scores.shape
    C = point_feats.shape[-1]
    idx = knn_idx.reshape(B, N * K)[..., None, None]
    gathered = jnp.take_along_axis(
        point_feats, idx.astype(jnp.int32).repeat(M, -2).repeat(C, -1), axis=1
    ).reshape(B, N, K, M, C)
    centers = center_feats[:, :, None]  # broadcast over K
    diff = gathered - centers[:, : N if centers.shape[1] >= N else None]
    return jnp.einsum("bnkm,bnkmc->bnkc", scores, diff)


class ScoreNet(nn.Module):
    """Relative-position -> weight-bank scores (reference paconv.py ScoreNet)."""

    num_matrices: int
    hidden: Sequence[int] = (16, 16)
    score_norm: str = "softmax"

    @nn.compact
    def __call__(self, rel_pos, train: bool = False):
        """rel_pos: (..., D) -> scores (..., M)."""
        h = rel_pos
        for i, c in enumerate(self.hidden):
            h = nn.Dense(c, name=f"dense{i}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=f"bn{i}",
            )(h)
            h = nn.relu(h)
        s = nn.Dense(self.num_matrices, name="out")(h)
        if self.score_norm == "softmax":
            return jax.nn.softmax(s, axis=-1)
        return jax.nn.sigmoid(s)


class PAConv(nn.Module):
    """Position-adaptive conv over grouped neighborhoods.

    Input (B, npoint, K, C_in + 3) where the last 3 channels are the
    relative xyz (as produced by QueryAndGroup with use_xyz); output
    (B, npoint, K, C_out). Matches reference PAConv's weight-bank mixing;
    kernel input = [rel_xyz] by default.
    """

    out_channels: int
    num_matrices: int = 8

    @nn.compact
    def __call__(self, grouped, train: bool = False):
        rel_xyz = grouped[..., :3]
        feats = grouped
        scores = ScoreNet(self.num_matrices, name="scorenet")(rel_xyz, train=train)
        bank = self.param(
            "weight_bank",
            nn.initializers.lecun_normal(),
            (self.num_matrices, feats.shape[-1], self.out_channels),
        )
        projected = jnp.einsum(
            "bnkc,mcd->bnkmd", feats, bank,
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum("bnkm,bnkmd->bnkd", scores, projected)
