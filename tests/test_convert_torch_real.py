"""End-to-end converter proof with real torch.

Builds a torch.nn module tree reproducing the reference's layer naming and
shapes (mmcv ConvModule stacks: ``<mod>.conv.weight`` / ``<mod>.bn.*`` —
naming source: mmdet3d/models/backbones/pointnet2_sa_ssg.py:11-142,
model_utils/vote_module.py:60-83, dense_heads/reliable_conv_bbox_module.py,
dense_heads/side_pooling_module.py:343-370), runs eval-mode torch forwards
of the individual blocks on CPU, converts the state_dict with
nesie_tpu.convert_torch, and asserts per-block output equality against the
flax modules.
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn as tnn

import jax.numpy as jnp

from nesie_tpu.convert_torch import convert_state_dict

# shipped ScanNet Nesie dims (configs/Nesie/nesie-votenet-scannet-train-010.py)
SA_CHANNELS = [
    (1 + 3, (64, 64, 128)),
    (128 + 3, (128, 128, 256)),
    (256 + 3, (128, 128, 256)),
    (256 + 3, (128, 128, 256)),
]
FP_CHANNELS = [(512, (256, 256)), (512, (256, 256))]
VOTE_IN, VOTE_CONV = 256, (256, 256)
AGG_IN, AGG_CHANNELS = 256 + 3, (128, 128, 128)
PRED_IN, PRED_SHARED = 128, (128, 128)
NUM_CLS_OUT, NUM_BBOX_OUT, NUM_HEADING_OUT = 20, 6 * 33, 2
MINI_IN, MINI_HIDE, MINI_FEAT = 40, 256, 128
HEAD_IN, IOU_SIZE = 128, 18


class ConvBNReLU(tnn.Module):
    """mmcv ConvModule stand-in: conv -> bn -> relu, children named
    conv / bn (the reference's state_dict layout)."""

    def __init__(self, cin, cout, dim=2, bias=False):
        super().__init__()
        conv = tnn.Conv2d if dim == 2 else tnn.Conv1d
        bn = tnn.BatchNorm2d if dim == 2 else tnn.BatchNorm1d
        self.conv = conv(cin, cout, 1, bias=bias)
        self.bn = bn(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _layer_stack(cin, channels, dim=2, bias=False):
    mods = OrderedDict()
    prev = cin
    for j, c in enumerate(channels):
        mods[f"layer{j}"] = ConvBNReLU(prev, c, dim=dim, bias=bias)
        prev = c
    return tnn.Sequential(mods)


class MiniPointNetTorch(tnn.Module):
    """Reference MiniPointNet (side_pooling_module.py:343-370)."""

    def __init__(self, cin, hide=MINI_HIDE, feat=MINI_FEAT):
        super().__init__()
        self.first_conv = tnn.Sequential(
            tnn.Conv2d(cin, hide, 1, bias=False), tnn.BatchNorm2d(hide),
            tnn.ReLU(), tnn.Conv2d(hide, hide // 2, 1))
        self.second_conv = tnn.Sequential(
            tnn.Conv2d(hide, hide, 1, bias=False), tnn.BatchNorm2d(hide),
            tnn.ReLU(), tnn.Conv2d(hide, feat, 1))

    def forward(self, x):
        # x: (B, C, K, N) -> (B, feat, K)
        h = self.first_conv(x)
        g = h.max(dim=-1, keepdim=True).values.expand_as(h)
        h = torch.cat([g, h], dim=1)
        h = self.second_conv(h)
        return h.max(dim=-1).values


def _head_seq(cin, iou_size):
    return tnn.Sequential(
        tnn.Conv1d(cin, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
        tnn.Conv1d(128, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
        tnn.Conv1d(128, iou_size, 1))


class RefNamedModel(tnn.Module):
    """Torch tree whose state_dict keys exactly match the reference's."""

    def __init__(self):
        super().__init__()
        backbone = tnn.Module()
        backbone.SA_modules = tnn.ModuleList()
        for cin, chans in SA_CHANNELS:
            sa = tnn.Module()
            sa.mlps = tnn.ModuleList([_layer_stack(cin, chans)])
            backbone.SA_modules.append(sa)
        backbone.FP_modules = tnn.ModuleList()
        for cin, chans in FP_CHANNELS:
            fp = tnn.Module()
            fp.mlps = _layer_stack(cin, chans)
            backbone.FP_modules.append(fp)
        self.backbone = backbone

        bbox_head = tnn.Module()
        vote = tnn.Module()
        # the reference's vote_conv is a plain nn.Sequential of ConvModules
        # (numeric child names, vote_module.py:62-75)
        vote.vote_conv = tnn.Sequential(
            *[ConvBNReLU(cin, cout, dim=1, bias=True)
              for cin, cout in zip((VOTE_IN,) + VOTE_CONV[:-1], VOTE_CONV)])
        vote.conv_out = tnn.Conv1d(VOTE_CONV[-1], 3 + VOTE_IN, 1)
        bbox_head.vote_module = vote

        agg = tnn.Module()
        agg.mlps = tnn.ModuleList([_layer_stack(AGG_IN, AGG_CHANNELS)])
        bbox_head.vote_aggregation = agg

        pred = tnn.Module()
        pred.shared_convs = _layer_stack(PRED_IN, PRED_SHARED, dim=1,
                                         bias=True)
        pred.conv_cls = tnn.Conv1d(PRED_SHARED[-1], NUM_CLS_OUT, 1)
        pred.conv_bbox = tnn.Conv1d(PRED_SHARED[-1], NUM_BBOX_OUT, 1)
        pred.conv_heading = tnn.Conv1d(PRED_SHARED[-1], NUM_HEADING_OUT, 1)
        bbox_head.conv_pred = pred

        grid = tnn.Module()
        grid.mlps_before = tnn.ModuleList(
            [MiniPointNetTorch(MINI_IN) for _ in range(7)])
        grid.mlps_head = tnn.ModuleList(
            [_head_seq(HEAD_IN, IOU_SIZE) for _ in range(6)]
            + [_head_seq(HEAD_IN, IOU_SIZE)])
        bbox_head.grid_conv = grid
        self.bbox_head = bbox_head


@pytest.fixture(scope="module")
def converted():
    torch.manual_seed(0)
    model = RefNamedModel()
    # randomize BN affine + running stats so the mapping of each tensor is
    # actually exercised (defaults are 0/1 and would mask transposes)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params, stats = convert_state_dict(sd)
    return model, params, stats


def _apply(mod, params, stats, *args, **kwargs):
    return mod.apply({"params": params, "batch_stats": stats}, *args,
                     train=False, **kwargs)


def _close(jx, tx, atol=2e-5):
    np.testing.assert_allclose(np.asarray(jx), tx.detach().numpy(),
                               rtol=1e-4, atol=atol)


def test_sa_mlp_forward_matches(converted):
    from nesie_tpu.nn.layers import PointMLP

    model, params, stats = converted
    for i, (cin, chans) in enumerate(SA_CHANNELS):
        x = np.random.default_rng(i).normal(
            size=(2, 6, 8, cin)).astype(np.float32)
        with torch.no_grad():
            tref = model.backbone.SA_modules[i].mlps[0](
                torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        got = _apply(PointMLP(chans), params["backbone"][f"sa{i}"]["mlp"],
                     stats["backbone"][f"sa{i}"]["mlp"], jnp.asarray(x))
        _close(got, tref)


def test_fp_mlp_forward_matches(converted):
    from nesie_tpu.nn.layers import PointMLP

    model, params, stats = converted
    for i, (cin, chans) in enumerate(FP_CHANNELS):
        x = np.random.default_rng(10 + i).normal(
            size=(2, 12, cin)).astype(np.float32)
        with torch.no_grad():
            tref = model.backbone.FP_modules[i].mlps(
                torch.from_numpy(x).permute(0, 2, 1).unsqueeze(-1)
            ).squeeze(-1).permute(0, 2, 1)
        got = _apply(PointMLP(chans), params["backbone"][f"fp{i}"]["mlp"],
                     stats["backbone"][f"fp{i}"]["mlp"], jnp.asarray(x))
        _close(got, tref)


def test_vote_module_forward_matches(converted):
    from nesie_tpu.nn.vote import VoteModule

    model, params, stats = converted
    rng = np.random.default_rng(20)
    seed_xyz = rng.normal(size=(2, 16, 3)).astype(np.float32)
    seed_feats = rng.normal(size=(2, 16, VOTE_IN)).astype(np.float32)

    with torch.no_grad():
        feats_t = torch.from_numpy(seed_feats).permute(0, 2, 1)
        x = model.bbox_head.vote_module.vote_conv(feats_t)
        votes = model.bbox_head.vote_module.conv_out(x)  # (B, 3+C, N)
        offset = votes[:, :3].permute(0, 2, 1)
        vote_xyz_t = torch.from_numpy(seed_xyz) + offset
        res = votes[:, 3:].permute(0, 2, 1)
        vote_feats_t = torch.from_numpy(seed_feats) + res
        vote_feats_t = vote_feats_t / vote_feats_t.norm(
            dim=-1, keepdim=True).clamp_min(1e-12)

    vote_xyz, vote_feats, off = _apply(
        VoteModule(in_channels=VOTE_IN, conv_channels=VOTE_CONV),
        params["bbox_head"]["vote_module"],
        stats["bbox_head"]["vote_module"],
        jnp.asarray(seed_xyz), jnp.asarray(seed_feats))
    _close(vote_xyz, vote_xyz_t)
    _close(vote_feats, vote_feats_t)
    _close(off, offset)


def test_conv_pred_forward_matches(converted):
    from nesie_tpu.nn.heads import ReliableConvBboxHead

    model, params, stats = converted
    rng = np.random.default_rng(30)
    x = rng.normal(size=(2, 16, PRED_IN)).astype(np.float32)

    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 2, 1)
        shared = model.bbox_head.conv_pred.shared_convs(xt)
        cls_t = model.bbox_head.conv_pred.conv_cls(shared).permute(0, 2, 1)
        bbox_t = model.bbox_head.conv_pred.conv_bbox(shared).permute(0, 2, 1)
        heading_t = model.bbox_head.conv_pred.conv_heading(shared).permute(
            0, 2, 1)

    head = ReliableConvBboxHead(
        shared_conv_channels=PRED_SHARED, num_cls_out=NUM_CLS_OUT,
        num_bbox_out=NUM_BBOX_OUT, num_heading_out=NUM_HEADING_OUT,
        bias=True)
    cls_out, reg_out = _apply(
        head, params["bbox_head"]["conv_pred"],
        stats["bbox_head"]["conv_pred"], jnp.asarray(x))
    _close(cls_out, cls_t)
    _close(reg_out, torch.cat([bbox_t, heading_t], dim=-1))


def test_mini_pointnet_forward_matches(converted):
    from nesie_tpu.nn.layers import MiniPointNet

    model, params, stats = converted
    rng = np.random.default_rng(40)
    # flax layout (B, K, N, C); torch layout (B, C, K, N)
    x = rng.normal(size=(2, 5, 9, MINI_IN)).astype(np.float32)
    for i, name in enumerate([f"side_mini{j}" for j in range(6)]
                             + ["box_mini"]):
        with torch.no_grad():
            tref = model.bbox_head.grid_conv.mlps_before[i](
                torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 1)
        got = _apply(MiniPointNet(feature_dim=MINI_FEAT, hide_dim=MINI_HIDE),
                     params["bbox_head"]["grid_conv"][name],
                     stats["bbox_head"]["grid_conv"][name], jnp.asarray(x))
        _close(got, tref)


def test_quality_heads_forward_match(converted):
    from nesie_tpu.nn.layers import PointMLP
    import flax.linen as fnn

    model, params, stats = converted
    rng = np.random.default_rng(50)
    x = rng.normal(size=(2, 16, HEAD_IN)).astype(np.float32)
    gq_p = params["bbox_head"]["grid_conv"]
    gq_s = stats["bbox_head"]["grid_conv"]

    for i in list(range(6)) + ["iou"]:
        torch_head = model.bbox_head.grid_conv.mlps_head[
            6 if i == "iou" else i]
        trunk_key = "iou_head_trunk" if i == "iou" else f"side_head{i}_trunk"
        out_key = "iou_head_out" if i == "iou" else f"side_head{i}_out"
        with torch.no_grad():
            tref = torch_head(
                torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)
        trunk = _apply(PointMLP((128, 128), bias=True), gq_p[trunk_key],
                       gq_s[trunk_key], jnp.asarray(x))
        got = fnn.Dense(IOU_SIZE).apply({"params": gq_p[out_key]}, trunk)
        _close(got, tref)
