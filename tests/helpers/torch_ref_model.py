"""Parameterized torch module tree with the reference's exact state_dict
naming (mmcv ConvModule layout), sized to ANY VoteNetNesie config.

tests/test_convert_torch_real.py proves per-block converter equality on
the full-size dims; this builder exists so the end-to-end checkpoint
rehearsal (tests/test_ckpt_parity_cli.py) can save a REAL `.pth` whose
every tensor shape matches a tiny flax model — exercising the converter's
shape-validation path through the production CLIs at test-friendly cost.

Naming sources: backbone mmdet3d/models/backbones/pointnet2_sa_ssg.py,
vote module model_utils/vote_module.py:60-83, head dense_heads/
reliable_conv_bbox_module.py + side_pooling_module.py:343-370, EMA
buffers simi_teacher_hook.py:39-52, checkpoint dict train.py:203-213.
"""
from __future__ import annotations

from collections import OrderedDict

import torch
from torch import nn as tnn


class ConvBNReLU(tnn.Module):
    def __init__(self, cin, cout, dim=2, bias=False):
        super().__init__()
        conv = tnn.Conv2d if dim == 2 else tnn.Conv1d
        bn = tnn.BatchNorm2d if dim == 2 else tnn.BatchNorm1d
        self.conv = conv(cin, cout, 1, bias=bias)
        self.bn = bn(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


def _layer_stack(cin, channels, dim=2, bias=False):
    mods = OrderedDict()
    prev = cin
    for j, c in enumerate(channels):
        mods[f"layer{j}"] = ConvBNReLU(prev, c, dim=dim, bias=bias)
        prev = c
    return tnn.Sequential(mods)


class MiniPointNetTorch(tnn.Module):
    def __init__(self, cin, hide=256, feat=128):
        super().__init__()
        self.first_conv = tnn.Sequential(
            tnn.Conv2d(cin, hide, 1, bias=False), tnn.BatchNorm2d(hide),
            tnn.ReLU(), tnn.Conv2d(hide, hide // 2, 1))
        self.second_conv = tnn.Sequential(
            tnn.Conv2d(hide, hide, 1, bias=False), tnn.BatchNorm2d(hide),
            tnn.ReLU(), tnn.Conv2d(hide, feat, 1))


def _head_seq(cin, iou_size):
    return tnn.Sequential(
        tnn.Conv1d(cin, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
        tnn.Conv1d(128, 128, 1), tnn.BatchNorm1d(128), tnn.ReLU(),
        tnn.Conv1d(128, iou_size, 1))


def build_ref_named_model(
    in_channels=4,
    sa_channels=((64, 64, 128), (128, 128, 256), (128, 128, 256),
                 (128, 128, 256)),
    fp_channels=((256, 256), (256, 256)),
    num_classes=18,
    reg_max=32,
    reg_topk=4,
    agg_channels=(128, 128, 128),
    pred_shared=(128, 128),
    mini_hide=256,
    mini_feat=128,
) -> tnn.Module:
    """Dims mirror nesie_tpu.nn.detector.VoteNetNesie's derivations so the
    produced state_dict converts 1:1 onto the same-config flax init."""
    seed = fp_channels[-1][-1]
    model = tnn.Module()

    backbone = tnn.Module()
    backbone.SA_modules = tnn.ModuleList()
    prev_feat = in_channels - 3
    for chans in sa_channels:
        sa = tnn.Module()
        sa.mlps = tnn.ModuleList([_layer_stack(prev_feat + 3, chans)])
        backbone.SA_modules.append(sa)
        prev_feat = chans[-1]
    backbone.FP_modules = tnn.ModuleList()
    # fp_i fuses the upstream feature with the skip SA output
    skip0 = sa_channels[-2][-1]
    skip1 = sa_channels[-3][-1]
    fp_cins = (sa_channels[-1][-1] + skip0, fp_channels[0][-1] + skip1)
    for cin, chans in zip(fp_cins, fp_channels):
        fp = tnn.Module()
        fp.mlps = _layer_stack(cin, chans)
        backbone.FP_modules.append(fp)
    model.backbone = backbone

    bbox_head = tnn.Module()
    vote = tnn.Module()
    vote_conv = (seed, seed)
    vote.vote_conv = tnn.Sequential(
        *[ConvBNReLU(cin, cout, dim=1, bias=True)
          for cin, cout in zip((seed,) + vote_conv[:-1], vote_conv)])
    vote.conv_out = tnn.Conv1d(vote_conv[-1], 3 + seed, 1)
    bbox_head.vote_module = vote

    agg = tnn.Module()
    agg.mlps = tnn.ModuleList([_layer_stack(seed + 3, agg_channels)])
    bbox_head.vote_aggregation = agg

    pred = tnn.Module()
    pred.shared_convs = _layer_stack(agg_channels[-1], pred_shared, dim=1,
                                     bias=True)
    pred.conv_cls = tnn.Conv1d(pred_shared[-1], 2 + num_classes, 1)
    pred.conv_bbox = tnn.Conv1d(pred_shared[-1], 6 * (reg_max + 1), 1)
    pred.conv_heading = tnn.Conv1d(pred_shared[-1], 2, 1)
    bbox_head.conv_pred = pred

    grid = tnn.Module()
    grid.mlps_before = tnn.ModuleList(
        [MiniPointNetTorch(3 + seed, mini_hide, mini_feat)
         for _ in range(7)])
    stat = (reg_max + 1) + reg_topk + 1
    grid.mlps_head = tnn.ModuleList(
        [_head_seq(mini_feat + stat, num_classes) for _ in range(6)]
        + [_head_seq(mini_feat, num_classes)])
    bbox_head.grid_conv = grid
    model.bbox_head = bbox_head
    return model


def randomize_bn(model, seed=0):
    """Randomize BN affine + running stats so every tensor mapping is
    exercised (defaults of 0/1 would mask transposes)."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)


def register_ema_buffers(model, perturb=0.05, seed=1):
    """SimiTeacherHook.hooks_before_run (simi_teacher_hook.py:39-52):
    every parameter gets an ``ema_<name with dots mangled>`` buffer. A
    small perturbation makes the saved teacher numerically distinct from
    the student so loading the wrong tree is detectable."""
    torch.manual_seed(seed)
    for name, value in dict(model.named_parameters(recurse=True)).items():
        buf = value.data.clone()
        buf += perturb * torch.randn(buf.shape)
        model.register_buffer(f"ema_{name.replace('.', '_')}", buf)


def save_reference_checkpoint(model, path, epoch=3):
    """The reference trainer's on-disk layout (mmcv save_checkpoint):
    meta + state_dict (incl. registered ema_* buffers) + optimizer."""
    torch.save(
        {
            "meta": {"epoch": epoch, "iter": epoch * 100,
                     "mmcv_version": "1.3.9"},
            "state_dict": model.state_dict(),
            "optimizer": {"state": {}, "param_groups": []},
        },
        path,
    )
