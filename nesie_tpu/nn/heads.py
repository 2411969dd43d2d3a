"""Prediction head layers: GFL integral decode + the reliable conv head.

Reference: mmdet3d/models/dense_heads/nesie_head.py:19 (Integral),
saqe_head.py:54 (AngleIntegral),
reliable_conv_bbox_module.py:10 (ReliableConvBboxHead).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import PointMLP


def integral_expectation(logits, reg_max: int):
    """softmax-expectation over the discrete set {0, 1/n, ..., 1}.

    Args:
        logits: (..., reg_max + 1).
    Returns:
        (...,) expected value in [0, 1].
    """
    project = jnp.linspace(0.0, 1.0, reg_max + 1, dtype=logits.dtype)
    return jnp.sum(jax.nn.softmax(logits, axis=-1) * project, axis=-1)


class Integral(nn.Module):
    """Stateless module wrapper kept for API parity."""

    reg_max: int = 32

    def __call__(self, logits):
        return integral_expectation(logits, self.reg_max)


def angle_integral_expectation(logits):
    """softmax-expectation angle decode (reference AngleIntegral,
    saqe_head.py:54-87 + side2box:206-207): expectation over
    {0, 1/n, ..., 1} (n = channels - 1), scaled to [0, 2*pi] and wrapped to
    (-pi, pi].

    Args:
        logits: (..., n+1).
    Returns:
        (...,) angle in radians.
    """
    n = logits.shape[-1] - 1
    project = jnp.linspace(0.0, 1.0, n + 1, dtype=logits.dtype)
    e = jnp.sum(jax.nn.softmax(logits, axis=-1) * project, axis=-1)
    ang = e * 2 * jnp.pi
    return jnp.where(ang > jnp.pi, ang - 2 * jnp.pi, ang)


class AngleIntegral(nn.Module):
    def __call__(self, logits):
        return angle_integral_expectation(logits)


class BaseConvBboxHead(nn.Module):
    """Shared convs -> optional cls / reg conv branches -> two outputs.

    Reference base_conv_bbox_head.py:10-130 (the original VoteNet head's
    prediction trunk; ReliableConvBboxHead extends it with the heading
    branch).
    """

    shared_conv_channels: Sequence[int] = (128, 128)
    cls_conv_channels: Sequence[int] = ()
    reg_conv_channels: Sequence[int] = ()
    num_cls_out: int = 20
    num_reg_out: int = 59
    bias: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, P, C) -> (cls (B, P, num_cls_out),
        reg (B, P, num_reg_out))."""
        x = feats
        if self.shared_conv_channels:
            x = PointMLP(
                self.shared_conv_channels, bias=self.bias, name="shared"
            )(x, train=train)

        xc = x
        if self.cls_conv_channels:
            xc = PointMLP(
                self.cls_conv_channels, bias=self.bias, name="cls_convs"
            )(xc, train=train)
        cls_out = nn.Dense(self.num_cls_out, name="conv_cls")(xc)

        xr = x
        if self.reg_conv_channels:
            xr = PointMLP(
                self.reg_conv_channels, bias=self.bias, name="reg_convs"
            )(xr, train=train)
        reg_out = nn.Dense(self.num_reg_out, name="conv_reg")(xr)
        return cls_out, reg_out


class ReliableConvBboxHead(nn.Module):
    """Shared trunk + cls / bbox-distribution / heading branches.

    The heading branch optionally gets GroupNorm(reg_max groups) conv layers
    (reliable_conv_bbox_module.py:124); with the shipped configs all branch
    conv lists are empty so each branch is a single Dense.
    """

    shared_conv_channels: Sequence[int] = (128, 128)
    cls_conv_channels: Sequence[int] = ()
    bbox_conv_channels: Sequence[int] = ()
    heading_conv_channels: Sequence[int] = ()
    num_cls_out: int = 20
    num_bbox_out: int = 198
    num_heading_out: int = 2
    reg_max: int = 32
    bias: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """feats: (B, P, C) -> (cls (B, P, num_cls_out),
        reg (B, P, num_bbox_out + num_heading_out))."""
        x = PointMLP(
            self.shared_conv_channels, bias=self.bias, name="shared"
        )(feats, train=train)

        xc = x
        if self.cls_conv_channels:
            xc = PointMLP(self.cls_conv_channels, bias=self.bias, name="cls_convs")(
                xc, train=train
            )
        cls_out = nn.Dense(self.num_cls_out, name="conv_cls")(xc)

        xb = x
        if self.bbox_conv_channels:
            xb = PointMLP(self.bbox_conv_channels, bias=self.bias, name="bbox_convs")(
                xb, train=train
            )
        bbox_out = nn.Dense(self.num_bbox_out, name="conv_bbox")(xb)

        xh = x
        if self.heading_conv_channels:
            xh = PointMLP(
                self.heading_conv_channels,
                norm="gn",
                gn_groups=self.reg_max,
                bias=self.bias,
                name="heading_convs",
            )(xh, train=train)
        heading_out = nn.Dense(self.num_heading_out, name="conv_heading")(xh)

        return cls_out, jnp.concatenate([bbox_out, heading_out], axis=-1)
