"""Golden tests, wave 7: the inventory-tail components (VERDICT round-3
item 6) matched numerically against the reference's own code running
under refshim:

* DeltaXYZWLHRBBoxCoder encode/decode (delta_xyzwhlr_bbox_coder.py)
* CenterPointBBoxCoder.decode (centerpoint_bbox_coders.py)
* IoUNegPiecewiseSampler (iou_neg_piecewise_sampler.py), both sides
  pinned to the same deterministic random_choice
* numpy VoxelGenerator / points_to_voxel (voxel_generator.py, the numba
  kernels running as pure python via the identity-jit shim)
* cosine_lr_after_step + intersectionAndUnion (models/utils/utils.py)
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests/helpers")
import refshim  # noqa: E402
from refshim import load_ref  # noqa: E402


def _install_bbox_shims():
    refshim.install_shims()
    if "mmdet.core.bbox" in sys.modules and hasattr(
        sys.modules["mmdet.core.bbox"], "BaseBBoxCoder"
    ):
        return

    class BaseBBoxCoder:
        def __init__(self, *a, **k):
            pass

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    bbox = types.ModuleType("mmdet.core.bbox")
    bbox.__path__ = []
    bbox.BaseBBoxCoder = BaseBBoxCoder
    builder = types.ModuleType("mmdet.core.bbox.builder")
    builder.BBOX_CODERS = _Registry()
    builder.BBOX_SAMPLERS = _Registry()
    sys.modules["mmdet.core.bbox"] = bbox
    sys.modules["mmdet.core.bbox.builder"] = builder
    sys.modules["mmdet.core"].bbox = bbox


# ------------------------------------------------------- DeltaXYZWLHR
@pytest.fixture(scope="module")
def ref_delta_coder():
    _install_bbox_shims()
    mod = load_ref(
        "mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py",
        "ref_delta_coder",
    )
    return mod.DeltaXYZWLHRBBoxCoder


@pytest.mark.parametrize("ndim", [7, 9])
def test_delta_xyzwhlr_coder(ref_delta_coder, ndim):
    from nesie_tpu.core.coders import delta_xyzwhlr_decode, delta_xyzwhlr_encode

    rng = np.random.default_rng(0)
    src = rng.uniform(0.5, 3.0, (64, ndim)).astype(np.float32)
    dst = rng.uniform(0.5, 3.0, (64, ndim)).astype(np.float32)
    ref_enc = ref_delta_coder.encode(torch.tensor(src), torch.tensor(dst))
    np.testing.assert_allclose(
        np.asarray(delta_xyzwhlr_encode(src, dst)), ref_enc.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    deltas = rng.normal(0, 0.3, (64, ndim)).astype(np.float32)
    ref_dec = ref_delta_coder.decode(torch.tensor(src), torch.tensor(deltas))
    np.testing.assert_allclose(
        np.asarray(delta_xyzwhlr_decode(src, deltas)), ref_dec.numpy(),
        rtol=1e-5, atol=1e-6,
    )
    # roundtrip on our side
    np.testing.assert_allclose(
        np.asarray(delta_xyzwhlr_decode(src, delta_xyzwhlr_encode(src, dst))),
        dst, rtol=1e-4, atol=1e-4,
    )


# -------------------------------------------------------- CenterPoint
@pytest.fixture(scope="module")
def ref_centerpoint_coder():
    _install_bbox_shims()
    mod = load_ref(
        "mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py",
        "ref_centerpoint_coder",
    )
    return mod.CenterPointBBoxCoder


@pytest.mark.parametrize("with_vel,with_reg", [(True, True), (False, False)])
def test_centerpoint_decode(ref_centerpoint_coder, with_vel, with_reg):
    from nesie_tpu.core.coders import centerpoint_decode, centerpoint_filter

    rng = np.random.default_rng(1)
    B, C, H, W, K = 2, 3, 8, 10, 20
    heat = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
    rot_s = rng.normal(0, 1, (B, 1, H, W)).astype(np.float32)
    rot_c = rng.normal(0, 1, (B, 1, H, W)).astype(np.float32)
    hei = rng.normal(0, 1, (B, 1, H, W)).astype(np.float32)
    dim = rng.uniform(0.5, 2, (B, 3, H, W)).astype(np.float32)
    vel = rng.normal(0, 1, (B, 2, H, W)).astype(np.float32) if with_vel else None
    reg = rng.uniform(0, 1, (B, 2, H, W)).astype(np.float32) if with_reg else None

    kw = dict(
        pc_range=[-50.0, -50.0],
        out_size_factor=4,
        voxel_size=[0.2, 0.2],
        post_center_range=[-60, -60, -10, 60, 60, 10],
        max_num=K,
        score_threshold=0.3,
    )
    ref = ref_centerpoint_coder(
        pc_range=kw["pc_range"], out_size_factor=kw["out_size_factor"],
        voxel_size=kw["voxel_size"],
        post_center_range=kw["post_center_range"], max_num=K,
        score_threshold=kw["score_threshold"],
    )
    t = lambda x: None if x is None else torch.tensor(x)  # noqa: E731
    ref_out = ref.decode(t(heat), t(rot_s), t(rot_c), t(hei), t(dim),
                         t(vel), reg=t(reg))

    ours = centerpoint_decode(
        heat, rot_s, rot_c, hei, dim, vel=vel, reg=reg, **kw
    )
    ours_f = centerpoint_filter(ours)
    for b in range(B):
        np.testing.assert_allclose(
            ours_f[b]["bboxes"], ref_out[b]["bboxes"].numpy(),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            ours_f[b]["scores"], ref_out[b]["scores"].numpy(),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_array_equal(
            ours_f[b]["labels"], ref_out[b]["labels"].numpy().astype(np.int32)
        )


# --------------------------------------------- IoUNegPiecewiseSampler
@pytest.fixture(scope="module")
def ref_piecewise_sampler():
    _install_bbox_shims()

    class _AssignResult:
        def __init__(self, gt_inds, max_overlaps, labels=None):
            self.gt_inds = gt_inds
            self.max_overlaps = max_overlaps
            self.labels = labels

        def add_gt_(self, gt_labels):
            n = len(gt_labels)
            self.gt_inds = torch.cat(
                [torch.arange(1, n + 1, dtype=self.gt_inds.dtype),
                 self.gt_inds]
            )
            self.max_overlaps = torch.cat(
                [self.max_overlaps.new_ones(n), self.max_overlaps]
            )
            if self.labels is not None:
                self.labels = torch.cat([gt_labels, self.labels])

    class _SamplingResult:
        def __init__(self, pos_inds, neg_inds, bboxes, gt_bboxes,
                     assign_result, gt_flags):
            self.pos_inds = pos_inds
            self.neg_inds = neg_inds
            self.pos_is_gt = gt_flags[pos_inds]
            self.pos_assigned_gt_inds = assign_result.gt_inds[pos_inds] - 1

    class _RandomSampler:
        def __init__(self, num, pos_fraction, neg_pos_ub=-1,
                     add_gt_as_proposals=True, **kwargs):
            self.num = num
            self.pos_fraction = pos_fraction
            self.neg_pos_ub = neg_pos_ub
            self.add_gt_as_proposals = add_gt_as_proposals
            self.pos_sampler = self
            self.neg_sampler = self

        def random_choice(self, gallery, num):
            # deterministic stand-in shared with the nesie_tpu side:
            # ascending order, first `num`
            return gallery.sort().values[:num]

    # the module does `from . import RandomSampler, SamplingResult`, so the
    # parent package itself must carry the stand-ins
    pkg = types.ModuleType("ref_samplers_pkg")
    pkg.__path__ = []
    pkg.RandomSampler = _RandomSampler
    pkg.SamplingResult = _SamplingResult
    sys.modules["ref_samplers_pkg"] = pkg
    mod = load_ref(
        "mmdet3d/core/bbox/samplers/iou_neg_piecewise_sampler.py",
        "ref_samplers_pkg.iou_neg_piecewise_sampler",
    )
    return mod.IoUNegPiecewiseSampler, _AssignResult


def _det_choice(gallery, num, rng):
    return np.sort(gallery)[:num]


@pytest.mark.parametrize("add_gt,return_iou,seed",
                         [(False, False, 0), (True, True, 1),
                          (False, True, 2)])
def test_iou_neg_piecewise_sampler(ref_piecewise_sampler, add_gt,
                                   return_iou, seed):
    from nesie_tpu.core.samplers import AssignResult, IoUNegPiecewiseSampler

    RefSampler, RefAssign = ref_piecewise_sampler
    rng = np.random.default_rng(seed)
    N, G = 300, 9
    gt_inds = rng.choice([0, 0, 0, 0, 1, 2, 3], N).astype(np.int64)
    max_overlaps = np.where(
        gt_inds > 0,
        rng.uniform(0.55, 1.0, N),
        rng.uniform(0.0, 0.6, N),
    ).astype(np.float32)
    bboxes = rng.normal(0, 1, (N, 7)).astype(np.float32)
    gt_bboxes = rng.normal(0, 1, (G, 7)).astype(np.float32)
    gt_labels = rng.integers(0, 5, G)

    kw = dict(
        num=128,
        pos_fraction=0.55,
        neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1],
        neg_pos_ub=-1,
        add_gt_as_proposals=add_gt,
        return_iou=return_iou,
    )
    ref = RefSampler(**kw)
    ref_res = ref.sample(
        RefAssign(torch.tensor(gt_inds), torch.tensor(max_overlaps),
                  torch.tensor(gt_labels)),
        torch.tensor(bboxes), torch.tensor(gt_bboxes),
        gt_labels=torch.tensor(gt_labels),
    )

    ours = IoUNegPiecewiseSampler(**kw, random_choice=_det_choice)
    res = ours.sample(
        AssignResult(gt_inds, max_overlaps, gt_labels),
        bboxes, gt_bboxes, gt_labels=gt_labels,
    )

    np.testing.assert_array_equal(res.pos_inds, ref_res.pos_inds.numpy())
    np.testing.assert_array_equal(res.neg_inds, ref_res.neg_inds.numpy())
    np.testing.assert_array_equal(
        res.pos_assigned_gt_inds, ref_res.pos_assigned_gt_inds.numpy()
    )
    np.testing.assert_array_equal(res.pos_is_gt,
                                  ref_res.pos_is_gt.numpy().astype(bool))
    if return_iou:
        np.testing.assert_allclose(res.iou, ref_res.iou.numpy(), rtol=1e-6)


def test_piecewise_sampler_extension_rule():
    """A starved first piece extends the second piece's quota
    (iou_neg_piecewise_sampler.py:73-95)."""
    from nesie_tpu.core.samplers import AssignResult, IoUNegPiecewiseSampler

    N = 200
    gt_inds = np.zeros(N, np.int64)
    gt_inds[:4] = 1
    # only 3 negatives with IoU in [0.1, 0.55) -> the low piece must absorb
    max_overlaps = np.full(N, 0.05, np.float32)
    max_overlaps[:4] = 0.9
    max_overlaps[4:7] = 0.3
    s = IoUNegPiecewiseSampler(
        num=64, pos_fraction=0.25, neg_piece_fractions=[0.8, 0.2],
        neg_iou_piece_thrs=[0.55, 0.1], random_choice=_det_choice,
    )
    res = s.sample(AssignResult(gt_inds, max_overlaps),
                   np.zeros((N, 7), np.float32), np.zeros((1, 7), np.float32))
    assert len(res.pos_inds) == 4
    assert len(res.neg_inds) == 60
    in_mid = (max_overlaps[res.neg_inds] >= 0.1) & (
        max_overlaps[res.neg_inds] < 0.55
    )
    assert in_mid.sum() == 3  # every mid-piece negative taken


# ------------------------------------------------------ VoxelGenerator
@pytest.fixture(scope="module")
def ref_voxel_generator():
    refshim.install_shims()
    return load_ref("mmdet3d/core/voxel/voxel_generator.py",
                    "ref_voxel_generator")


@pytest.mark.parametrize("max_points,max_voxels,seed",
                         [(5, 100, 0), (3, 20, 1), (35, 20000, 2)])
def test_voxel_generator(ref_voxel_generator, max_points, max_voxels, seed):
    from nesie_tpu.data.voxel_generator import VoxelGenerator

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1.5, 4.5, (2000, 4)).astype(np.float32)
    kw = dict(
        voxel_size=[0.5, 0.5, 0.5],
        point_cloud_range=[0, -1, -1, 4, 4, 1],
        max_num_points=max_points,
        max_voxels=max_voxels,
    )
    ref = ref_voxel_generator.VoxelGenerator(**kw)
    ref_vox, ref_coors, ref_num = ref.generate(pts)
    ours = VoxelGenerator(**kw)
    vox, coors, num = ours.generate(pts)
    np.testing.assert_array_equal(coors, ref_coors)
    np.testing.assert_array_equal(num, ref_num)
    np.testing.assert_allclose(vox, ref_vox)
    np.testing.assert_array_equal(ours.grid_size, ref.grid_size)


# ------------------------------------------------- models/utils helpers
@pytest.fixture(scope="module")
def ref_model_utils():
    refshim.install_shims()
    return load_ref("mmdet3d/models/utils/utils.py", "ref_model_utils")


def test_cosine_lr_after_step(ref_model_utils):
    from nesie_tpu.train.state import make_cosine_lr_after_step

    base_lr, step_epoch, total = 0.01, 4, 20
    sched = make_cosine_lr_after_step(base_lr, steps_per_epoch=10,
                                      step_epoch=step_epoch,
                                      total_epochs=total)

    class _Opt:
        param_groups = [{}]

    opt = _Opt()
    for epoch in range(total):
        ref_model_utils.cosine_lr_after_step(opt, base_lr, epoch,
                                             step_epoch, total)
        ours = float(sched(epoch * 10))
        # jnp schedule computes in float32; the reference in float64
        assert ours == pytest.approx(opt.param_groups[0]["lr"],
                                     rel=1e-4, abs=1e-8)


def test_intersection_and_union(ref_model_utils):
    from nesie_tpu.eval.seg_metrics import intersection_and_union, seg_eval

    rng = np.random.default_rng(3)
    K = 6
    target = rng.integers(0, K, 5000)
    target[rng.uniform(size=5000) < 0.1] = 255
    output = np.where(rng.uniform(size=5000) < 0.7, target,
                      rng.integers(0, K, 5000))
    output[output == 255] = rng.integers(0, K)

    ref_i, ref_u, ref_t = ref_model_utils.intersectionAndUnion(
        output.copy(), target, K, ignore_index=255
    )
    i, u, t = intersection_and_union(output, target, K, ignore_index=255)
    np.testing.assert_array_equal(i, ref_i)
    np.testing.assert_array_equal(u, ref_u)
    np.testing.assert_array_equal(t, ref_t)

    m = seg_eval([output], [target], K)
    assert 0.0 < m["mIoU"] <= 1.0
    assert m["allAcc"] == pytest.approx(i.sum() / t.sum())


# ----------------------------------------------- MLP / clip_sigmoid tail
def test_clip_sigmoid_matches_reference():
    refshim.install_shims()
    mod = load_ref("mmdet3d/models/utils/clip_sigmoid.py", "ref_clip_sigmoid")
    from nesie_tpu.nn.layers import clip_sigmoid

    x = np.linspace(-20, 20, 101, dtype=np.float32)
    ref = mod.clip_sigmoid(torch.from_numpy(x.copy())).numpy()
    np.testing.assert_allclose(np.asarray(clip_sigmoid(x)), ref, atol=1e-7)
    # the clamp must bite at saturation (that's the helper's entire job)
    assert np.asarray(clip_sigmoid(x)).min() == pytest.approx(1e-4)
    assert np.asarray(clip_sigmoid(x)).max() == pytest.approx(1 - 1e-4)


def test_mlp_matches_reference():
    refshim.install_shims()
    mod = load_ref("mmdet3d/models/utils/mlp.py", "ref_mlp")
    import jax.numpy as jnp

    from nesie_tpu.nn.layers import MLP

    torch.manual_seed(0)
    ref = mod.MLP(in_channel=18, conv_channels=(32, 16))
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params, stats = {}, {}
    for i in range(2):
        params[f"dense{i}"] = {
            "kernel": sd[f"mlp.layer{i}.conv.weight"][:, :, 0].T,
            "bias": sd[f"mlp.layer{i}.conv.bias"],
        }
        params[f"norm{i}"] = {"scale": sd[f"mlp.layer{i}.bn.weight"],
                              "bias": sd[f"mlp.layer{i}.bn.bias"]}
        stats[f"norm{i}"] = {"mean": sd[f"mlp.layer{i}.bn.running_mean"],
                             "var": sd[f"mlp.layer{i}.bn.running_var"]}

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 18, 40)).astype(np.float32)  # (B, C, N)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()  # (B, 16, N)

    got = MLP(conv_channels=(32, 16)).apply(
        {"params": {"mlp": params}, "batch_stats": {"mlp": stats}},
        jnp.asarray(x.transpose(0, 2, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=2e-5)


# ------------------------------------- ScanNet instance-seg benchmark
@pytest.fixture(scope="module")
def ref_inst_eval():
    refshim.install_shims()
    # the reference file predates numpy 1.24's alias removal; only add
    # the aliases this numpy actually lacks (np.bool is real in numpy 2)
    added = []
    for alias, real in (("float", float), ("bool", bool)):
        if not hasattr(np, alias):
            setattr(np, alias, real)
            added.append(alias)
    load_ref("mmdet3d/models/utils/utils_3d.py",
             "mmdet3d.models.utils.utils_3d")
    load_ref("mmdet3d/models/utils/utils.py", "mmdet3d.models.utils.utils")
    yield load_ref("mmdet3d/models/utils/eval.py", "ref_inst_eval")
    for alias in added:
        delattr(np, alias)


def _make_scene(rng, n_verts, classes):
    """GT ids (label*1000+idx, groups <1000, 0 unannotated) + predictions
    exercising every benchmark rule: small GTs, groups, void, duplicate
    preds on one GT, tiny preds, invalid-class preds."""
    gt = np.zeros(n_verts, np.int64)
    pos = 0
    instances = []
    for k, cls in enumerate(classes):
        size = int(rng.integers(120, 400))
        gt[pos:pos + size] = cls * 1000 + k + 1
        instances.append((cls, pos, size))
        pos += size
    # a small (sub-min-region) GT of the first class
    small_cls = classes[0]
    gt[pos:pos + 60] = small_cls * 1000 + 900
    small_span = (pos, 60)
    pos += 60
    # a group instance (id < 1000)
    gt[pos:pos + 150] = 400
    group_span = (pos, 150)
    pos += 150
    # the rest stays 0 (unannotated -> void)

    preds, labels, confs = [], [], []

    def add_pred(span, label, conf, jitter=0):
        m = np.zeros(n_verts, np.int64)
        s, ln = span
        m[max(0, s - jitter):s + ln - jitter] = 1
        preds.append(m)
        labels.append(label)
        confs.append(conf)

    for i, (cls, s, ln) in enumerate(instances):
        add_pred((s, ln), cls, float(rng.uniform(0.3, 0.95)))
        if i == 0:  # duplicate prediction on the same GT, lower score
            add_pred((s, ln), cls, 0.05, jitter=10)
    # pred mostly over the small GT (ignore path)
    add_pred((small_span[0], small_span[1] + 50), small_cls, 0.5)
    # pred mostly over the group / void (ignore path)
    add_pred((group_span[0], group_span[1] + 30), classes[0], 0.6)
    # pure-void false positive
    add_pred((n_verts - 200, 180), classes[1], 0.7)
    # tiny pred (< min region) — must be skipped
    add_pred((0, 50), classes[0], 0.9)
    # invalid class id — must be skipped
    add_pred((instances[0][1], instances[0][2]), 2, 0.8)
    return gt, dict(mask=np.stack(preds), label_id=np.asarray(labels),
                    conf=np.asarray(confs, np.float64))


def test_scannet_instance_benchmark_matches_reference(ref_inst_eval,
                                                      tmp_path):
    from nesie_tpu.eval.instance_seg import scannet_instance_benchmark

    rng = np.random.default_rng(11)
    scenes = [_make_scene(rng, 4000, [3, 5, 8]),
              _make_scene(rng, 3000, [5, 9])]
    # scene 2: drop the first class's matching pred so one GT is a hard FN
    gt2, info2 = scenes[1]
    keep = np.ones(len(info2["label_id"]), bool)
    keep[0] = False
    scenes[1] = (gt2, {k: v[keep] for k, v in info2.items()})

    matches = {}
    for i, (gt_ids, info) in enumerate(scenes):
        f = tmp_path / f"scene{i}.txt"
        f.write_text("\n".join(str(x) for x in gt_ids))
        gt2pred, pred2gt = ref_inst_eval.assign_instances_for_scan(
            f"scene{i}", info, str(f))
        matches[f"scene{i}"] = {"gt": gt2pred, "pred": pred2gt}
    ap = ref_inst_eval.evaluate_matches(matches)
    want = ref_inst_eval.compute_averages(ap)

    got = scannet_instance_benchmark([s[0] for s in scenes],
                                     [s[1] for s in scenes])

    for k in ("all_ap", "all_ap_50%", "all_ap_25%"):
        np.testing.assert_allclose(got[k], want[k], atol=1e-9, err_msg=k)
    for name in got["classes"]:
        for k in ("ap", "ap50%", "ap25%"):
            np.testing.assert_allclose(
                got["classes"][name][k], want["classes"][name][k],
                atol=1e-9, equal_nan=True, err_msg=f"{name}/{k}")
