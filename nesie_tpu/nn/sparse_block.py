"""Sparse ResNet blocks (reference mmdet3d/ops/sparse_block.py) on top of
the XLA sparse-conv ops — flax modules owning the kernel weights."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from nesie_tpu.ops.spconv import SparseTensor, sparse_conv3d, submanifold_conv3d


class SubMConv3d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        k3 = self.kernel_size**3
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (k3, x.features.shape[-1], self.out_channels),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return submanifold_conv3d(x, w, b, self.kernel_size)


class SparseConv3d(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 2
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: SparseTensor) -> SparseTensor:
        k3 = self.kernel_size**3
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (k3, x.features.shape[-1], self.out_channels),
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )
        return sparse_conv3d(x, w, b, self.kernel_size, self.stride)


class _SparseBN(nn.Module):
    @nn.compact
    def __call__(self, x: SparseTensor, train: bool) -> SparseTensor:
        f = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5
        )(x.features)
        return x._replace(features=f * x.valid[:, None])


class SparseBasicBlock(nn.Module):
    """Two submanifold convs with BN/ReLU and a residual connection
    (reference SparseBasicBlock, sparse_block.py)."""

    channels: int

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        identity = x.features
        out = SubMConv3d(self.channels, name="conv1")(x)
        out = _SparseBN(name="bn1")(out, train)
        out = out._replace(features=nn.relu(out.features))
        out = SubMConv3d(self.channels, name="conv2")(out)
        out = _SparseBN(name="bn2")(out, train)
        if identity.shape[-1] != self.channels:
            identity = nn.Dense(self.channels, use_bias=False, name="down")(
                identity
            )
        f = nn.relu(out.features + identity) * x.valid[:, None]
        return out._replace(features=f)
