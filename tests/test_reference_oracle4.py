"""Golden tests, wave 4: the reference's own MODULE FORWARDS — VoteModule,
ReliableConvBboxHead and the SidePooling quality module — run unmodified
from /root/reference (mmcv's ConvModule/build_conv_layer/three_nn replaced
by faithful stand-ins in helpers/refshim.py, hard-coded ``.cuda()`` calls
no-opped) with their weights pushed through nesie_tpu.convert_torch, then
matched numerically against the flax modules.

This upgrades tests/test_convert_torch_real.py (hand-built torch replicas
with reference naming) to the reference *code itself* producing the
oracle outputs.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch
from torch import nn as tnn

sys.path.insert(0, "/root/repo/tests/helpers")
import refshim  # noqa: E402
from refshim import load_ref  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nesie_tpu.convert_torch import convert_state_dict  # noqa: E402

B, N_SEED, P, K2 = 2, 256, 8, 16
FEAT = 32          # seed_feat_dim (small for CPU speed)
REG_MAX = 32       # hard-coded in the reference head channel math (33+4+1)
C_CLS = 5


def _stub_pkg(name, **attrs):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(sys.modules[name], k, v)
    return sys.modules[name]


@pytest.fixture(scope="module")
def ref_modules(tmp_path_factory):
    """Real reference modules wired into a converter-shaped torch tree."""
    refshim.install_shims()
    # hard-coded .cuda() in generate_grid / rot_gpu
    # (side_pooling_module.py:101,337) -> identity on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self

    _stub_pkg("mmdet3d.models")
    _stub_pkg("mmdet3d.models.builder", build_loss=lambda cfg: None)
    vote_mod = load_ref("mmdet3d/models/model_utils/vote_module.py",
                        "ref_vote_module")
    head_mod = load_ref(
        "mmdet3d/models/dense_heads/reliable_conv_bbox_module.py",
        "ref_reliable_head")
    side_mod = load_ref("mmdet3d/models/dense_heads/side_pooling_module.py",
                        "ref_side_pooling")

    means = tmp_path_factory.mktemp("means") / "means.npz"
    np.savez(means, arr_0=np.ones((C_CLS, 3), np.float32))

    torch.manual_seed(0)
    wrapper = tnn.Module()
    bh = tnn.Module()
    bh.vote_module = vote_mod.VoteModule(
        in_channels=FEAT, vote_per_seed=1, gt_per_seed=3,
        conv_channels=(FEAT, FEAT), norm_feats=True)
    bh.conv_pred = head_mod.ReliableConvBboxHead(
        in_channels=FEAT, shared_conv_channels=(FEAT, FEAT),
        heading_conv_channels=(FEAT,),
        num_cls_out_channels=C_CLS + 2,
        num_bbox_out_channels=6 * (REG_MAX + 1),
        num_heading_out_channels=2, reg_max=REG_MAX, bias=True)
    bh.grid_conv = side_mod.SidePooling(
        num_class=C_CLS, num_heading_bin=1, num_size_cluster=C_CLS,
        mean_size_arr_path=str(means), num_proposal=P, sampling="vote",
        seed_feat_dim=FEAT)
    wrapper.bbox_head = bh
    # randomize BN affine + running stats so eval-mode normalization is a
    # real transform (defaults would mask mapping bugs)
    with torch.no_grad():
        for m in wrapper.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d,
                              tnn.GroupNorm)):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    wrapper.eval()

    sd = {k: v.numpy() for k, v in wrapper.state_dict().items()}
    params, stats = convert_state_dict(sd, num_sa=0, num_fp=0)
    yield wrapper, params, stats
    torch.Tensor.cuda = orig_cuda


def _apply(module, variables, *args, **kw):
    return module.apply(variables, *args, train=False, **kw)


def test_vote_module_forward_matches_reference(ref_modules):
    from nesie_tpu.nn.vote import VoteModule

    wrapper, params, stats = ref_modules
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(B, N_SEED, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N_SEED, FEAT)).astype(np.float32)

    with torch.no_grad():
        vp, vf, off = wrapper.bbox_head.vote_module(
            torch.from_numpy(xyz),
            torch.from_numpy(feats).transpose(2, 1).contiguous())

    ours = VoteModule(in_channels=FEAT, conv_channels=(FEAT, FEAT))
    gvp, gvf, goff = _apply(
        ours,
        {"params": params["bbox_head"]["vote_module"],
         "batch_stats": stats["bbox_head"]["vote_module"]},
        jnp.asarray(xyz), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(gvp), vp.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gvf),
                               vf.transpose(2, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(goff),
                               off.transpose(2, 1).numpy(), atol=2e-5)


def test_reliable_head_forward_matches_reference(ref_modules):
    """Incl. the GroupNorm(reg_max) heading branch
    (reliable_conv_bbox_module.py:124-142)."""
    from nesie_tpu.nn.heads import ReliableConvBboxHead

    wrapper, params, stats = ref_modules
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(B, P, FEAT)).astype(np.float32)

    with torch.no_grad():
        cls_t, reg_t = wrapper.bbox_head.conv_pred(
            torch.from_numpy(feats).transpose(2, 1).contiguous())

    ours = ReliableConvBboxHead(
        shared_conv_channels=(FEAT, FEAT), heading_conv_channels=(FEAT,),
        num_cls_out=C_CLS + 2, num_bbox_out=6 * (REG_MAX + 1),
        num_heading_out=2, reg_max=REG_MAX, bias=True)
    cls_g, reg_g = _apply(
        ours,
        {"params": params["bbox_head"]["conv_pred"],
         "batch_stats": stats["bbox_head"]["conv_pred"]},
        jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(cls_g),
                               cls_t.transpose(2, 1).numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(reg_g),
                               reg_t.transpose(2, 1).numpy(), atol=2e-5)


def test_side_pooling_forward_matches_reference(ref_modules):
    """The full quality module: box/side grid generation + rotation, 3-NN
    inverse-distance feature interpolation, distribution statistics,
    per-face MiniPointNets + heads, box IoU head
    (side_pooling_module.py:266-324) over 2P main+jitter proposals."""
    from nesie_tpu.nn.side_pooling import SidePooling

    wrapper, params, stats = ref_modules
    rng = np.random.default_rng(2)
    seed_xyz = rng.uniform(-2, 2, (B, N_SEED, 3)).astype(np.float32)
    seed_feats = rng.normal(size=(B, N_SEED, FEAT)).astype(np.float32)
    center = rng.uniform(-1.5, 1.5, (B, K2, 3)).astype(np.float32)
    size = rng.uniform(0.5, 2.0, (B, K2, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (B, K2)).astype(np.float32)
    probs_raw = rng.normal(size=(B, P, 6, REG_MAX + 1)).astype(np.float32)
    probs = np.exp(probs_raw) / np.exp(probs_raw).sum(-1, keepdims=True)

    end_points = {
        "seed_points": torch.from_numpy(seed_xyz),
        "seed_features": torch.from_numpy(seed_feats).transpose(2, 1)
        .contiguous(),
        # reference layout (B, 6, reg_max+1, P)
        "bbox_probs": torch.from_numpy(probs).permute(0, 2, 3, 1)
        .contiguous(),
    }
    with torch.no_grad():
        out = wrapper.bbox_head.grid_conv(
            torch.from_numpy(center), torch.from_numpy(size),
            torch.from_numpy(heading), end_points)
    want_side = out["side_scores"].permute(1, 3, 0, 2).numpy()  # B,K2,6,C
    want_iou = out["iou_scores"].numpy()                        # B,K2,C

    ours = SidePooling(num_classes=C_CLS, seed_feat_dim=FEAT,
                       reg_max=REG_MAX)
    got_side, got_iou = _apply(
        ours,
        {"params": params["bbox_head"]["grid_conv"],
         "batch_stats": stats["bbox_head"]["grid_conv"]},
        jnp.asarray(center), jnp.asarray(size), jnp.asarray(heading),
        jnp.asarray(seed_xyz), jnp.asarray(seed_feats), jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(got_side), want_side,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou,
                               rtol=1e-4, atol=2e-4)


def test_quality_estimation_forward_matches_reference(ref_modules,
                                                      tmp_path):
    """The SAQE quality module (quelity_estimation_module.py:286-346):
    per-face grids tripled +/-10% along their normals, 3-NN interpolation,
    2-conv side heads, fused global head -> iou/rotate/R_obj."""
    from nesie_tpu.nn.quality_estimation import QualityEstimation

    wrapper, _, _ = ref_modules  # fixture installs shims + .cuda patch
    qe_mod = load_ref(
        "mmdet3d/models/dense_heads/quelity_estimation_module.py",
        "ref_quality_estimation")

    means = tmp_path / "means.npz"
    np.savez(means, arr_0=np.ones((C_CLS, 3), np.float32))
    torch.manual_seed(1)
    saqe = tnn.Module()
    bh = tnn.Module()
    bh.vote_module = wrapper.bbox_head.vote_module
    bh.conv_pred = wrapper.bbox_head.conv_pred
    bh.grid_conv = qe_mod.QualityEstimation(
        num_class=C_CLS, num_heading_bin=1, num_size_cluster=C_CLS,
        mean_size_arr_path=str(means), num_proposal=P, sampling="vote",
        seed_feat_dim=FEAT)
    saqe.bbox_head = bh
    with torch.no_grad():
        for m in bh.grid_conv.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    saqe.eval()
    sd = {k: v.numpy() for k, v in saqe.state_dict().items()}
    params, stats = convert_state_dict(sd, num_sa=0, num_fp=0, head="saqe")

    rng = np.random.default_rng(3)
    seed_xyz = rng.uniform(-2, 2, (B, N_SEED, 3)).astype(np.float32)
    seed_feats = rng.normal(size=(B, N_SEED, FEAT)).astype(np.float32)
    center = rng.uniform(-1.5, 1.5, (B, K2, 3)).astype(np.float32)
    size = rng.uniform(0.5, 2.0, (B, K2, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (B, K2)).astype(np.float32)
    probs_raw = rng.normal(size=(B, P, 6, REG_MAX + 1)).astype(np.float32)
    probs = np.exp(probs_raw) / np.exp(probs_raw).sum(-1, keepdims=True)

    end_points = {
        "seed_points": torch.from_numpy(seed_xyz),
        "seed_features": torch.from_numpy(seed_feats).transpose(2, 1)
        .contiguous(),
        "bbox_probs": torch.from_numpy(probs).permute(0, 2, 3, 1)
        .contiguous(),
    }
    with torch.no_grad():
        out = bh.grid_conv(torch.from_numpy(center), torch.from_numpy(size),
                           torch.from_numpy(heading), end_points)
    want_side = out["side_scores"].permute(1, 3, 0, 2).numpy()
    want_iou = out["iou_scores"].numpy()
    want_rot = out["rotate_scores"].numpy()
    want_robj = out["R_obj_scores"].numpy()

    ours = QualityEstimation(num_classes=C_CLS, seed_feat_dim=FEAT,
                             reg_max=REG_MAX)
    got_side, got_iou, got_rot, got_robj = _apply(
        ours,
        {"params": params["bbox_head"]["grid_conv"],
         "batch_stats": stats["bbox_head"]["grid_conv"]},
        jnp.asarray(center), jnp.asarray(size), jnp.asarray(heading),
        jnp.asarray(seed_xyz), jnp.asarray(seed_feats), jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(got_side), want_side,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_iou), want_iou,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_rot), want_rot,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_robj), want_robj,
                               rtol=1e-4, atol=2e-4)
