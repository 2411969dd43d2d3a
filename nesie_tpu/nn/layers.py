"""Shared neural layers (flax.linen), channels-last.

Every 1x1 Conv1d/Conv2d in the reference is a per-point matmul, so here
they are ``nn.Dense`` over the trailing channel dim — which XLA maps
straight onto the MXU with the batch/point dims as rows.

BatchNorm note: under jit with a data-sharded mesh, the batch mean/var are
*global* (single-program semantics), so data-parallel training gets the
reference's opt-in NaiveSyncBatchNorm (reference mmdet3d/ops/norm.py)
behavior for free.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def clip_sigmoid(x, eps: float = 1e-4):
    """Sigmoid clamped to [eps, 1-eps] (reference
    mmdet3d/models/utils/clip_sigmoid.py:1-16) — keeps the focal-loss
    ``log`` terms of heatmap heads finite at saturation."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1.0 - eps)


class PointMLP(nn.Module):
    """Dense(+BN+ReLU) stack matching torch ConvModule chains.

    Args:
        channels: output width per layer.
        final_activation: apply BN+ReLU after the last layer too (torch
            ConvModule stacks do; prediction convs don't).
        norm: "bn" | "gn" | "none".
        bias: dense bias. Torch ConvModule's bias='auto' means no bias when
            a norm follows.
    """

    channels: Sequence[int]
    final_activation: bool = True
    norm: str = "bn"
    gn_groups: int = 32
    bias: str | bool = "auto"
    dtype: jnp.dtype | None = None  # e.g. jnp.bfloat16 compute, f32 params

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            last = i == n - 1
            normed = self.final_activation or not last
            if self.bias == "auto":
                use_bias = not (normed and self.norm != "none")
            else:
                use_bias = bool(self.bias)
            x = nn.Dense(c, use_bias=use_bias, dtype=self.dtype,
                         name=f"dense{i}")(x)
            if normed:
                if self.norm == "bn":
                    x = nn.BatchNorm(
                        use_running_average=not train,
                        momentum=0.9,
                        epsilon=1e-5,
                        dtype=self.dtype,
                        name=f"norm{i}",
                    )(x)
                elif self.norm == "gn":
                    # epsilon matches torch GroupNorm (1e-5); flax's
                    # default 1e-6 costs ~2e-3 absolute vs the reference
                    x = nn.GroupNorm(num_groups=self.gn_groups,
                                     epsilon=1e-5,
                                     dtype=self.dtype, name=f"norm{i}")(x)
                x = nn.relu(x)
        if self.dtype is not None:
            x = x.astype(jnp.float32)  # hand f32 back to the caller
        return x


class MLP(nn.Module):
    """Per-point feature MLP (reference mmdet3d/models/utils/mlp.py:1-50).

    The reference stacks 1x1 Conv1d + BN1d + ReLU over (B, C, N) with an
    explicit ``bias=True`` on every conv (unlike ConvModule's ``'auto'``);
    here each layer is a Dense over channels-last (B, N, C) input, which
    is the same matmul in MXU-friendly layout.
    """

    conv_channels: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return PointMLP(self.conv_channels, final_activation=True,
                        norm="bn", bias=True, name="mlp")(x, train=train)


class SyncBatchNorm(nn.BatchNorm):
    """Cross-replica BatchNorm (reference NaiveSyncBatchNorm1d/2d,
    mmdet3d/ops/norm.py:9-133).

    Under jit with a data-sharded mesh, plain BatchNorm is already globally
    synced (single-program semantics). This explicit variant exists for
    shard_map/pmap contexts where each program sees only its shard — set
    ``axis_name`` to the mapped axis and the mean/var reduce across it.
    """

    use_running_average: bool | None = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: str | None = "dp"


class MiniPointNet(nn.Module):
    """PointNet over grouped grid points with a global-max skip.

    Mirrors the reference quality-module MiniPointNet
    (side_pooling_module.py:343): conv->BN->ReLU->conv, concat per-group
    max, conv->BN->ReLU->conv, final max over the group dim.

    Input (B, K, N, C) -> output (B, K, feature_dim).
    """

    feature_dim: int = 128
    hide_dim: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hide_dim, use_bias=False, name="first0")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn0"
        )(h)
        h = nn.relu(h)
        h = nn.Dense(self.hide_dim // 2, name="first1")(h)
        g = jnp.max(h, axis=-2, keepdims=True)  # (B, K, 1, hide/2)
        h = jnp.concatenate([jnp.broadcast_to(g, h.shape), h], axis=-1)
        h = nn.Dense(self.hide_dim, use_bias=False, name="second0")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(h)
        h = nn.relu(h)
        h = nn.Dense(self.feature_dim, name="second1")(h)
        return jnp.max(h, axis=-2)  # (B, K, feature_dim)
