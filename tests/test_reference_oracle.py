"""Golden tests: run the reference's own torch/numpy code (imported straight
from /root/reference under sys.modules shims — see helpers/refshim.py) and
assert numeric equality with the nesie_tpu ports.

This is the strongest parity evidence available without data/checkpoints:
the oracle is the reference implementation actually executing, not a
re-derivation of it.
"""
from __future__ import annotations

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/repo/tests/helpers")
import refshim  # noqa: E402
from refshim import load_ref  # noqa: E402

import jax.numpy as jnp  # noqa: E402


# --------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def ref_surface():
    return load_ref("mmdet3d/models/losses/surface_loss.py", "ref_surface_loss")


@pytest.fixture(scope="module")
def ref_gfocal():
    return load_ref("mmdet3d/models/losses/gfocal_loss.py", "ref_gfocal_loss")


@pytest.fixture(scope="module")
def ref_chamfer():
    return load_ref("mmdet3d/models/losses/chamfer_distance.py", "ref_chamfer")


@pytest.fixture(scope="module")
def ref_indoor_eval():
    return load_ref("mmdet3d/core/evaluation/indoor_eval.py", "ref_indoor_eval")


@pytest.fixture(scope="module")
def ref_box_np_ops():
    mod = load_ref("mmdet3d/core/bbox/box_np_ops.py", "ref_box_np_ops")
    # data_augment_utils does `from mmdet3d.core.bbox import box_np_ops`
    refshim.install_shims()
    for name in ("mmdet3d", "mmdet3d.core", "mmdet3d.core.bbox"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["mmdet3d.core.bbox"].box_np_ops = mod
    return mod


@pytest.fixture(scope="module")
def ref_aug_utils(ref_box_np_ops):
    return load_ref("mmdet3d/datasets/pipelines/data_augment_utils.py",
                    "ref_data_augment_utils")


@pytest.fixture(scope="module")
def ref_depth_boxes():
    """The reference's real DepthInstance3DBoxes (box flip/rotate/scale/
    translate semantics), loaded with its CUDA-op imports stubbed."""
    refshim.install_shims()
    for name in ("mmdet3d", "mmdet3d.core", "mmdet3d.core.points",
                 "mmdet3d.ops", "mmdet3d.ops.iou3d"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["mmdet3d.core.points"].BasePoints = object
    sys.modules["mmdet3d.ops"].points_in_boxes_batch = None
    sys.modules["mmdet3d.ops.iou3d"].iou3d_cuda = None
    load_ref("mmdet3d/core/bbox/structures/utils.py", "refboxes.utils")
    load_ref("mmdet3d/core/bbox/structures/base_box3d.py",
             "refboxes.base_box3d")
    mod = load_ref("mmdet3d/core/bbox/structures/depth_box3d.py",
                   "refboxes.depth_box3d")
    return mod.DepthInstance3DBoxes


@pytest.fixture(scope="module")
def ref_votenet_nesie(ref_depth_boxes):
    single_stage = types.ModuleType("refdetectors.single_stage")

    class SingleStage3DDetector:  # inert base; only module funcs + bound
        def __init__(self, *a, **k):  # methods on a bare instance are used
            pass

    single_stage.SingleStage3DDetector = SingleStage3DDetector
    refshim.install_shims()
    for name in ("mmdet3d", "mmdet3d.core"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    core = sys.modules["mmdet3d.core"]
    core.bbox3d2result = lambda *a, **k: None
    core.merge_aug_bboxes_3d = lambda *a, **k: None
    core.DepthInstance3DBoxes = ref_depth_boxes
    return load_ref(
        "mmdet3d/models/detectors/votenet_nesie.py",
        "refdetectors.votenet_nesie",
        package_modules={"single_stage": single_stage},
    )


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """Reference code hard-codes .cuda(); run it on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


# ------------------------------------------------------ surface loss helpers
def test_bbox2surface_matches_reference(ref_surface):
    from nesie_tpu.losses.surface import bbox_to_surface

    rng = np.random.default_rng(0)
    bbox = rng.normal(size=(5, 9, 7)).astype(np.float32)
    ref = ref_surface.Bbox2Surface(torch.from_numpy(bbox)).numpy()
    got = np.asarray(bbox_to_surface(jnp.asarray(bbox)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_transform_surface_matches_reference(ref_surface):
    from nesie_tpu.losses.surface import transform_surface

    rng = np.random.default_rng(1)
    surface = rng.normal(size=(7, 6)).astype(np.float32)
    center = rng.normal(size=(7, 3)).astype(np.float32)
    scale = rng.uniform(0.5, 3.0, size=(7, 6)).astype(np.float32)
    ref = ref_surface.TransformSurface(
        torch.from_numpy(surface), torch.from_numpy(center),
        torch.from_numpy(scale)).numpy()
    got = np.asarray(transform_surface(
        jnp.asarray(surface), jnp.asarray(center), jnp.asarray(scale)))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_surface2prob_matches_reference(ref_surface):
    from nesie_tpu.losses.surface import surface_to_prob

    rng = np.random.default_rng(2)
    reg_max = 32
    # mix of in-range and the reference's out-of-range fallbacks
    target = np.concatenate([
        rng.uniform(0.0, 1.0, size=(40,)),
        rng.uniform(-0.5, 0.0, size=(8,)),
        rng.uniform(1.0, 1.5, size=(8,)),
    ]).astype(np.float32).reshape(7, 8)
    prob = np.zeros((7, 8, reg_max + 1), np.float32)

    lp, rp, lw, rw = ref_surface.Surface2Prob(
        torch.from_numpy(target.copy()), torch.from_numpy(prob))
    ref_left = lp.numpy().argmax(-1).reshape(7, 8)
    ref_right = rp.numpy().argmax(-1).reshape(7, 8)

    gl, gr, glw, grw = surface_to_prob(jnp.asarray(target), reg_max)
    np.testing.assert_array_equal(np.asarray(gl), ref_left)
    np.testing.assert_array_equal(np.asarray(gr), ref_right)
    np.testing.assert_allclose(np.asarray(glw), lw.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grw), rw.numpy(), atol=1e-5)


# ------------------------------------------------------------------ gfocal
@pytest.mark.parametrize("use_sigmoid", [True, False])
def test_quality_focal_loss_matches_reference(ref_gfocal, use_sigmoid):
    from nesie_tpu.losses.gfocal import quality_focal_loss

    rng = np.random.default_rng(3)
    n, c = 40, 18
    if use_sigmoid:
        pred = rng.normal(size=(n, c)).astype(np.float32)
    else:
        pred = rng.uniform(0.05, 0.95, size=(n, c)).astype(np.float32)
    label = rng.integers(0, c + 3, size=(n,))  # some background (>= c)
    score = rng.uniform(0, 1, size=(n,)).astype(np.float32)

    ref = ref_gfocal.quality_focal_loss(
        torch.from_numpy(pred),
        (torch.from_numpy(label), torch.from_numpy(score)),
        weight=None, reduction="none", beta=2.0,
        use_sigmoid=use_sigmoid).numpy()
    got = np.asarray(quality_focal_loss(
        jnp.asarray(pred), jnp.asarray(label), jnp.asarray(score),
        beta=2.0, use_sigmoid=use_sigmoid))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_distribution_focal_loss_matches_reference(ref_gfocal):
    from nesie_tpu.losses.gfocal import distribution_focal_loss

    rng = np.random.default_rng(4)
    n, bins = 50, 33
    pred = rng.normal(size=(n, bins)).astype(np.float32)
    label = rng.uniform(0, bins - 1 - 1e-3, size=(n,)).astype(np.float32)
    ref = ref_gfocal.distribution_focal_loss(
        torch.from_numpy(pred), torch.from_numpy(label),
        weight=None, reduction="none").numpy()
    got = np.asarray(distribution_focal_loss(
        jnp.asarray(pred), jnp.asarray(label)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# ----------------------------------------------------------------- chamfer
@pytest.mark.parametrize("mode", ["l2", "l1", "smooth_l1"])
def test_chamfer_distance_matches_reference(ref_chamfer, mode):
    from nesie_tpu.losses.chamfer import chamfer_distance

    rng = np.random.default_rng(5)
    src = rng.normal(size=(3, 20, 3)).astype(np.float32)
    dst = rng.normal(size=(3, 11, 3)).astype(np.float32)

    rs, rd, ri1, ri2 = ref_chamfer.chamfer_distance(
        torch.from_numpy(src), torch.from_numpy(dst),
        criterion_mode=mode, reduction="none")
    gs, gd, gi1, gi2 = chamfer_distance(
        jnp.asarray(src), jnp.asarray(dst), mode=mode)
    np.testing.assert_allclose(np.asarray(gs), rs.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gd), rd.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(gi1), ri1.numpy())
    np.testing.assert_array_equal(np.asarray(gi2), ri2.numpy())


# -------------------------------------------------------------- indoor eval
def test_average_precision_matches_reference(ref_indoor_eval):
    from nesie_tpu.eval.indoor_eval import average_precision

    rng = np.random.default_rng(6)
    n = 30
    rec = np.sort(rng.uniform(0, 1, size=(n,)))
    prec = rng.uniform(0, 1, size=(n,))
    ref = ref_indoor_eval.average_precision(rec, prec, mode="area")
    got = average_precision(rec, prec)
    np.testing.assert_allclose(got, ref[0], rtol=1e-6)


class _BoxArr:
    """Adapter implementing the slice of the mmdet3d box-structure API that
    the reference indoor_eval touches (tensor / new_box / overlaps / len /
    indexing / convert_to). IoU delegates to the port's pairwise_iou3d so the
    comparison isolates the reference's greedy matching + AP logic."""

    def __init__(self, tensor):
        if not torch.is_tensor(tensor):
            tensor = torch.as_tensor(
                np.asarray(tensor, np.float32).reshape(-1, 7))
        self.tensor = tensor

    def __len__(self):
        return self.tensor.reshape(-1, 7).shape[0]

    def __getitem__(self, i):
        row = _BoxArr(self.tensor.reshape(-1, 7)[i])
        row.tensor = self.tensor.reshape(-1, 7)[i]
        return row

    def new_box(self, t):
        return _BoxArr(t)

    def convert_to(self, mode):
        return self

    @staticmethod
    def overlaps(a, b):
        # the reference's real overlaps is the CW-rotating iou3d kernel
        # (base_box3d.py:387, REFERENCE_QUIRKS item 11); inject the port's
        # cw_kernel mode so both sides use the reference convention and
        # the comparison isolates greedy matching + AP logic
        from nesie_tpu.eval.np_iou import pairwise_iou3d

        return torch.from_numpy(
            pairwise_iou3d(a.tensor.reshape(-1, 7).numpy(),
                           b.tensor.reshape(-1, 7).numpy(),
                           bev="cw_kernel"))


def _random_scene_boxes(rng, n):
    c = rng.uniform(-3, 3, size=(n, 3))
    s = rng.uniform(0.4, 1.6, size=(n, 3))
    yaw = rng.uniform(-np.pi, np.pi, size=(n, 1))
    return np.concatenate([c, s, yaw], axis=1).astype(np.float32)


def test_eval_det_cls_matches_reference(ref_indoor_eval):
    from nesie_tpu.eval.indoor_eval import eval_det_cls

    rng = np.random.default_rng(7)
    scenes = [0, 1, 2, 3]
    iou_thr = [0.25, 0.5]
    gt, pred = {}, {}
    gt_port, pred_port = {}, {}
    for sid in scenes:
        g = _random_scene_boxes(rng, rng.integers(1, 6))
        d = np.concatenate(
            [g[rng.integers(0, len(g), size=4)]
             + rng.normal(scale=0.15, size=(4, 7)).astype(np.float32),
             _random_scene_boxes(rng, 3)])
        scores = rng.uniform(0, 1, size=(len(d),)).astype(np.float32)
        gt[sid] = [_BoxArr(row) for row in g]
        for b in gt[sid]:
            b.tensor = b.tensor.reshape(7)
        pred[sid] = [(_BoxArr(row), float(s)) for row, s in zip(d, scores)]
        for b, _ in pred[sid]:
            b.tensor = b.tensor.reshape(7)
        gt_port[sid] = g
        pred_port[sid] = (d, scores)

    ref = ref_indoor_eval.eval_det_cls(pred, gt, iou_thr)
    got = eval_det_cls(pred_port, gt_port, iou_thr)
    for (r_rec, r_prec, r_ap), (g_rec, g_prec, g_ap) in zip(ref, got):
        np.testing.assert_allclose(g_rec, r_rec, rtol=1e-6)
        np.testing.assert_allclose(g_prec, r_prec, rtol=1e-6)
        np.testing.assert_allclose(g_ap, float(r_ap[0]), rtol=1e-6)


def test_indoor_eval_matches_reference(ref_indoor_eval):
    from nesie_tpu.eval.indoor_eval import indoor_eval

    rng = np.random.default_rng(8)
    num_scenes, num_classes = 6, 5
    class_names = [f"c{i}" for i in range(num_classes)]
    gt_annos_ref, dt_annos_ref = [], []
    gt_annos, dt_annos = [], []
    for _ in range(num_scenes):
        ng = int(rng.integers(2, 7))
        g = _random_scene_boxes(rng, ng)
        gl = rng.integers(0, num_classes, size=(ng,))
        nd = int(rng.integers(6, 14))
        d = np.concatenate(
            [g[rng.integers(0, ng, size=nd // 2)]
             + rng.normal(scale=0.1, size=(nd // 2, 7)).astype(np.float32),
             _random_scene_boxes(rng, nd - nd // 2)])
        dl = rng.integers(0, num_classes, size=(nd,))
        ds = rng.uniform(0, 1, size=(nd,)).astype(np.float32)

        gt_annos_ref.append({
            "gt_num": ng,
            "gt_boxes_upright_depth": g,
            "class": gl,
        })
        dt_annos_ref.append({
            "labels_3d": torch.from_numpy(dl),
            "boxes_3d": _BoxArr(torch.from_numpy(d)),
            "scores_3d": torch.from_numpy(ds),
        })
        gt_annos.append({"boxes": g, "labels": gl})
        dt_annos.append({"boxes": d, "scores": ds, "labels": dl})

    label2cat = dict(enumerate(class_names))
    ref = ref_indoor_eval.indoor_eval(
        gt_annos_ref, dt_annos_ref, [0.25, 0.5], label2cat,
        box_type_3d=lambda arr, box_dim=7, origin=None: _BoxArr(arr),
        box_mode_3d=None)
    got = indoor_eval(gt_annos, dt_annos, iou_thrs=(0.25, 0.5),
                      class_names=class_names)
    for key, val in ref.items():
        assert key in got, key
        np.testing.assert_allclose(got[key], val, rtol=1e-5, atol=1e-7,
                                   err_msg=key)


# -------------------------------------------------------------- box_np_ops
def test_rotation_points_single_angle_matches_reference(ref_box_np_ops):
    from nesie_tpu.core.np_box_ops import rotation_points_single_angle

    rng = np.random.default_rng(9)
    pts = rng.normal(size=(12, 3))
    for axis in (0, 1, 2):
        ang = float(rng.uniform(-np.pi, np.pi))
        ref, _ = ref_box_np_ops.rotation_points_single_angle(pts, ang,
                                                             axis=axis)
        got = rotation_points_single_angle(pts, ang, axis=axis)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_center_to_corner_box3d_matches_reference(ref_box_np_ops):
    from nesie_tpu.core.np_box_ops import center_to_corner_box3d

    rng = np.random.default_rng(10)
    n = 9
    centers = rng.normal(size=(n, 3))
    dims = rng.uniform(0.3, 2.0, size=(n, 3))
    angles = rng.uniform(-np.pi, np.pi, size=(n,))
    ref = ref_box_np_ops.center_to_corner_box3d(
        centers, dims, angles, origin=(0.5, 0.5, 0.5), axis=2)
    got = center_to_corner_box3d(centers, dims, angles,
                                 origin=(0.5, 0.5, 0.5))
    np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-12)


def test_corner_to_standup_matches_reference(ref_box_np_ops):
    from nesie_tpu.core.np_box_ops import corner_to_standup_nd

    rng = np.random.default_rng(11)
    corners = rng.normal(size=(7, 8, 3))
    ref = ref_box_np_ops.corner_to_standup_nd_jit(corners)
    got = corner_to_standup_nd(corners)
    np.testing.assert_allclose(got, ref)


def test_points_in_rbbox_matches_reference(ref_box_np_ops):
    from nesie_tpu.core.np_box_ops import points_in_rbbox

    rng = np.random.default_rng(12)
    pts = rng.uniform(-4, 4, size=(300, 3))
    boxes = np.concatenate([
        rng.uniform(-2, 2, size=(6, 3)),
        rng.uniform(0.5, 2.5, size=(6, 3)),
        rng.uniform(-np.pi, np.pi, size=(6, 1)),
    ], axis=1)
    ref = ref_box_np_ops.points_in_rbbox(pts, boxes, z_axis=2,
                                         origin=(0.5, 0.5, 0))
    got = points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0))
    np.testing.assert_array_equal(got, ref)


def test_limit_period_matches_reference(ref_box_np_ops):
    from nesie_tpu.core.np_box_ops import limit_period

    rng = np.random.default_rng(13)
    val = rng.uniform(-10, 10, size=(50,))
    np.testing.assert_allclose(
        limit_period(val), ref_box_np_ops.limit_period(val), rtol=1e-12)


def test_box_collision_test_matches_reference(ref_aug_utils):
    from nesie_tpu.core.np_box_ops import box_collision_test, \
        center_to_corner_box2d

    rng = np.random.default_rng(14)
    n = 24
    centers = rng.uniform(-3, 3, size=(n, 2))
    dims = rng.uniform(0.4, 2.0, size=(n, 2))
    angles = rng.uniform(-np.pi, np.pi, size=(n,))
    corners = center_to_corner_box2d(centers, dims, angles)
    ref = ref_aug_utils.box_collision_test(corners.copy(), corners.copy())
    got = box_collision_test(corners, corners, literal_reference=True)
    np.testing.assert_array_equal(got, ref)

    # the fixed default only adds collisions (complete containment, which
    # the reference's dead containment branch misses)
    fixed = box_collision_test(corners, corners)
    assert np.all(fixed | ~ref)


def test_reference_collision_misses_containment(ref_aug_utils,
                                                ref_box_np_ops):
    """Pin the reference bug itself: a 1x1 box centered inside a 4x4 box is
    not flagged by the reference, but is by the fixed default."""
    from nesie_tpu.core.np_box_ops import box_collision_test

    big = ref_box_np_ops.center_to_corner_box2d(
        np.array([[0.0, 0.0]]), np.array([[4.0, 4.0]]), np.array([0.3]))
    small = ref_box_np_ops.center_to_corner_box2d(
        np.array([[0.0, 0.0]]), np.array([[1.0, 1.0]]), np.array([1.0]))
    ref = ref_aug_utils.box_collision_test(big.copy(), small.copy())
    assert not ref[0, 0]
    assert box_collision_test(big, small)[0, 0]
    assert not box_collision_test(big, small, literal_reference=True)[0, 0]


# ---------------------------------------------------------- pseudo labels
def test_lhs_nms_matches_reference(ref_votenet_nesie):
    from nesie_tpu.train.pseudo_label import lhs_nms_keep_mask

    rng = np.random.default_rng(15)
    k = 48
    lo = rng.uniform(-3, 3, size=(k, 3))
    hi = lo + rng.uniform(0.3, 2.0, size=(k, 3))
    scores = rng.uniform(0, 1, size=(k,))
    classes = rng.integers(0, 4, size=(k,))
    boxes8 = np.concatenate(
        [lo, hi, scores[:, None], classes[:, None]], axis=1)

    pick = ref_votenet_nesie.lhs_3d_faster_samecls(boxes8, 0.25, False)
    ref_keep = np.zeros(k, bool)
    ref_keep[np.asarray(pick)] = True

    got = np.asarray(lhs_nms_keep_mask(
        jnp.asarray(np.concatenate([lo, hi], axis=1), jnp.float32),
        jnp.asarray(scores, jnp.float32),
        jnp.asarray(classes), 0.25))
    np.testing.assert_array_equal(got, ref_keep)


def _reference_classwise_acc(ulb_list, ulb_flag, lb_n, ulb_n, num_classes,
                             thresh_warmup):
    """The reference's own loop (votenet_nesie.py:133-147), verbatim
    semantics on CPU tensors."""
    selected_label = ulb_list
    ulb_count = 10 * ulb_flag.sum() * lb_n / ulb_n
    pseudo_counter = selected_label.sum(dim=0)
    sorted_, indices = torch.sort(pseudo_counter, descending=True)
    acc = torch.zeros((num_classes,))
    if thresh_warmup:
        for i in indices:
            acc[i] = sorted_[i] / max(max(sorted_), ulb_count)
            acc[i] = acc[i] / (2.0 - acc[i])
    else:
        for i in indices:
            acc[i] = sorted_[i] / max(sorted_)
            acc[i] = acc[i] / (2.0 - acc[i])
    return acc


@pytest.mark.parametrize("thresh_warmup", [True, False])
def test_classwise_acc_literal_matches_reference(thresh_warmup):
    from nesie_tpu.train.pseudo_label import classwise_acc

    rng = np.random.default_rng(16)
    U, C, L = 37, 18, 12
    ulb_list = rng.integers(0, 9, size=(U, C)).astype(np.float32)
    ulb_flag = (rng.uniform(size=(U,)) > 0.4).astype(np.float32)

    ref = _reference_classwise_acc(
        torch.from_numpy(ulb_list), torch.from_numpy(ulb_flag), L, U, C,
        thresh_warmup).numpy()
    got = np.asarray(classwise_acc(
        jnp.asarray(ulb_list), jnp.asarray(ulb_flag), L,
        thresh_warmup=thresh_warmup, literal=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def _teacher_fixture(rng, B=3, P=128, C=18):
    """Random teacher outputs with a healthy fraction passing the filters."""
    boxes = np.concatenate([
        rng.uniform(-4, 4, size=(B, P, 2)),
        rng.uniform(0, 2, size=(B, P, 1)),
        rng.uniform(0.3, 1.4, size=(B, P, 3)),
        rng.uniform(-np.pi, np.pi, size=(B, P, 1)),
    ], axis=-1).astype(np.float32)
    cls_ids = rng.integers(0, C, size=(B, P))
    sem = rng.uniform(0, 0.4, size=(B, P, C)).astype(np.float32)
    peak = rng.uniform(0.5, 1.0, size=(B, P)).astype(np.float32)
    np.put_along_axis(sem, cls_ids[..., None], peak[..., None], axis=-1)
    obj = rng.normal(scale=3.0, size=(B, P, 2)).astype(np.float32)
    iou = rng.uniform(0, 0.6, size=(B, P, C)).astype(np.float32)
    side = rng.uniform(0, 1, size=(B, P, 6, C)).astype(np.float32)
    votes = rng.uniform(-4, 4, size=(B, P, 3)).astype(np.float32)
    return {
        "bbox_preds": boxes,
        "sem_scores": sem,
        "obj_scores": obj,
        "iou_scores": iou,
        "side_scores": side,
        "vote_points": votes,
    }


def test_get_pseudo_labels_literal_matches_reference(ref_votenet_nesie,
                                                     cpu_cuda):
    from nesie_tpu.train.pseudo_label import (PseudoLabelConfig,
                                              classwise_acc,
                                              get_pseudo_labels)

    rng = np.random.default_rng(17)
    B, P, C, U, L = 3, 128, 18, 41, 13
    fixture = _teacher_fixture(rng, B, P, C)
    ulb_list = rng.integers(0, 7, size=(U, C)).astype(np.float32)
    ulb_flag = (rng.uniform(size=(U,)) > 0.5).astype(np.float32)

    # ---- reference method on a bare instance ----
    det = ref_votenet_nesie.VoteNetNesie.__new__(
        ref_votenet_nesie.VoteNetNesie)
    det.ulb_list = torch.from_numpy(ulb_list)
    det.ulb_flag = torch.from_numpy(ulb_flag)
    det.lb_map = list(range(L))
    det.ulb_map = list(range(U))
    det.CLASSES = [f"c{i}" for i in range(C)]
    det.train_cfg = SimpleNamespace(thresh_warmup=True, use_cbl=True)
    ref_inputs = {k: torch.from_numpy(v.copy()) for k, v in fixture.items()}
    ref_labels, ref_boxes, ref_quality = det.get_pseudo_labels(
        ref_inputs, dataset_name="ScanNet")

    # ---- port, literal-reference mode ----
    cfg = PseudoLabelConfig(num_classes=C, literal_reference_cbl=True)
    acc = classwise_acc(jnp.asarray(ulb_list), jnp.asarray(ulb_flag), L,
                        thresh_warmup=True, literal=True)
    pl = get_pseudo_labels(
        {k: jnp.asarray(v) for k, v in fixture.items()}, acc, cfg)

    valid = np.asarray(pl.valid)
    boxes = np.asarray(pl.boxes)
    labels = np.asarray(pl.labels)
    quality = np.asarray(pl.quality)

    total_ref = sum(len(x) for x in ref_labels)
    assert total_ref >= 8, "fixture too weak to exercise the filter"
    assert int(valid.sum()) == total_ref

    for b in range(B):
        vb = valid[b]
        got_boxes = boxes[b][vb]
        got_labels = labels[b][vb]
        got_quality = quality[b][vb]
        rb = ref_boxes[b].numpy().reshape(-1, 7)
        rl = ref_labels[b].numpy().reshape(-1)
        rq = ref_quality[b].numpy().reshape(-1, 6)
        assert got_boxes.shape == rb.shape
        # both sides are ordered by descending pos_obj * iou among valid rows
        np.testing.assert_allclose(got_boxes, rb, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(got_labels, rl.astype(np.int64))
        np.testing.assert_allclose(got_quality, rq, rtol=1e-4, atol=1e-5)


def test_get_pseudo_labels_default_mode_differs_only_in_thresholds(
        ref_votenet_nesie, cpu_cuda):
    """Sanity: the non-literal (fixed-up) mode runs on the same fixture and
    produces a valid mask of the same shape; A/B results live in
    REFERENCE_QUIRKS.md."""
    from nesie_tpu.train.pseudo_label import (PseudoLabelConfig,
                                              classwise_acc,
                                              get_pseudo_labels)

    rng = np.random.default_rng(18)
    B, P, C, U, L = 2, 64, 18, 20, 8
    fixture = _teacher_fixture(rng, B, P, C)
    ulb_list = rng.integers(0, 7, size=(U, C)).astype(np.float32)
    ulb_flag = np.ones((U,), np.float32)
    for literal in (False, True):
        cfg = PseudoLabelConfig(num_classes=C, literal_reference_cbl=literal)
        acc = classwise_acc(jnp.asarray(ulb_list), jnp.asarray(ulb_flag), L,
                            thresh_warmup=True, literal=literal)
        pl = get_pseudo_labels(
            {k: jnp.asarray(v) for k, v in fixture.items()}, acc, cfg)
        assert pl.valid.shape == (B, 64)


def _apply_ref_aug(boxes, aug, rng):
    """Replay one view's augmentation pipeline on reference boxes exactly
    as RandomFlip3D + GlobalRotScaleTrans would (flips, then R -> S -> T),
    returning (augmented boxes, img_metas dict)."""
    meta = {"transformation_3d_flow": []}
    if aug["flip_h"]:
        boxes.flip("horizontal")
        meta["transformation_3d_flow"].append("HF")
    if aug["flip_v"]:
        boxes.flip("vertical")
        meta["transformation_3d_flow"].append("VF")
    # the pipeline records rot_mat_T from rotate(angle, points)
    # (transforms_3d.py _rot_bbox_points)
    _, rot_mat_t = boxes.rotate(float(aug["rot"]), torch.zeros((1, 3)))
    meta["pcd_rotation"] = rot_mat_t
    boxes.scale(float(aug["scale"]))
    meta["pcd_scale_factor"] = float(aug["scale"])
    boxes.translate(torch.from_numpy(aug["trans"]))
    meta["pcd_trans"] = aug["trans"]
    meta["transformation_3d_flow"] += ["R", "S", "T"]
    return boxes, meta


def test_pseudo_box_reprojection_matches_reference(ref_votenet_nesie,
                                                   ref_depth_boxes):
    """Weak->strong pseudo-box reprojection: the reference's
    transformation_bbox_preds (untransform by the teacher's img_metas, then
    re-transform by the student's, votenet_nesie.py:310-324 + 596-634) vs
    the port's vectorized reproject_boxes over AugParams."""
    from nesie_tpu.data.augment import AugParams, reproject_boxes

    rng = np.random.default_rng(21)

    def rand_aug(flip_h, flip_v):
        return {
            "flip_h": flip_h,
            "flip_v": flip_v,
            "rot": float(rng.uniform(-0.3, 0.3)),
            "scale": float(rng.uniform(0.85, 1.15)),
            "trans": rng.normal(scale=0.1, size=3).astype(np.float32),
        }

    det = ref_votenet_nesie.VoteNetNesie.__new__(
        ref_votenet_nesie.VoteNetNesie)

    # cover every flip combination on both sides
    cases = [((False, False), (True, True)),
             ((True, False), (False, True)),
             ((True, True), (True, False)),
             ((False, True), (False, False))]
    for (t_flips, s_flips) in cases:
        raw = np.concatenate([
            rng.uniform(-3, 3, size=(6, 2)),
            rng.uniform(0, 1.5, size=(6, 1)),
            rng.uniform(0.3, 1.5, size=(6, 3)),
            rng.uniform(-np.pi, np.pi, size=(6, 1)),
        ], axis=1).astype(np.float32)
        aug_t = rand_aug(*t_flips)
        aug_s = rand_aug(*s_flips)

        # teacher-frame boxes + both metas, via the reference's own box ops
        bt, meta_t = _apply_ref_aug(
            ref_depth_boxes(torch.from_numpy(raw.copy()), box_dim=7,
                            with_yaw=True), aug_t, rng)
        bs_expected, meta_s = _apply_ref_aug(
            ref_depth_boxes(torch.from_numpy(raw.copy()), box_dim=7,
                            with_yaw=True), aug_s, rng)

        out = det.transformation_bbox_preds(
            [bt.tensor], img_metas_t=[meta_t], img_metas_s=[meta_s])
        ref_boxes = out[0].tensor.numpy()

        # the reference path round-trips to the strong frame
        np.testing.assert_allclose(ref_boxes[:, :6],
                                   bs_expected.tensor.numpy()[:, :6],
                                   rtol=1e-4, atol=1e-5)

        # the port's vectorized replay
        def params(a):
            return AugParams(
                flip_h=jnp.asarray([a["flip_h"]]),
                flip_v=jnp.asarray([a["flip_v"]]),
                rot=jnp.asarray([a["rot"]]),
                scale=jnp.asarray([a["scale"]]),
                trans=jnp.asarray(a["trans"])[None],
            )

        got = np.asarray(reproject_boxes(
            jnp.asarray(bt.tensor.numpy())[None], params(aug_t),
            params(aug_s)))[0]
        np.testing.assert_allclose(got[:, :6], ref_boxes[:, :6], rtol=1e-4,
                                   atol=1e-5)
        # yaw modulo 2*pi (flip composition can differ by full turns)
        dyaw = (got[:, 6] - ref_boxes[:, 6] + np.pi) % (2 * np.pi) - np.pi
        np.testing.assert_allclose(dyaw, 0.0, atol=1e-4)


@pytest.fixture(scope="module")
def ref_box3d_nms():
    refshim.install_shims()
    for name in ("mmdet3d", "mmdet3d.ops", "mmdet3d.ops.iou3d",
                 "mmdet3d.ops.iou3d.iou3d_utils"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["mmdet3d.ops.iou3d.iou3d_utils"].nms_gpu = None
    sys.modules["mmdet3d.ops.iou3d.iou3d_utils"].nms_normal_gpu = None
    return load_ref("mmdet3d/core/post_processing/box3d_nms.py",
                    "ref_box3d_nms")


def test_aligned_3d_nms_matches_reference(ref_box3d_nms):
    from nesie_tpu.core.nms import aligned_3d_nms_mask

    rng = np.random.default_rng(22)
    n = 60
    lo = rng.uniform(-3, 3, size=(n, 3))
    hi = lo + rng.uniform(0.3, 1.8, size=(n, 3))
    boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    classes = rng.integers(0, 5, size=(n,))

    pick = ref_box3d_nms.aligned_3d_nms(
        torch.from_numpy(boxes), torch.from_numpy(scores),
        torch.from_numpy(classes), 0.25).numpy()
    ref_keep = np.zeros(n, bool)
    ref_keep[pick] = True

    got = np.asarray(aligned_3d_nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
        0.25))
    np.testing.assert_array_equal(got, ref_keep)


def test_circle_nms_matches_reference(ref_box3d_nms):
    from nesie_tpu.core.multiclass_nms import circle_nms

    rng = np.random.default_rng(23)
    n = 50
    dets = np.concatenate([
        rng.uniform(-4, 4, size=(n, 2)),
        rng.uniform(0, 1, size=(n, 1)),
    ], axis=1)
    keep_idx = ref_box3d_nms.circle_nms(dets, thresh=1.0)
    ref_keep = np.zeros(n, bool)
    ref_keep[np.asarray(keep_idx, int)] = True

    got = np.asarray(circle_nms(jnp.asarray(dets, jnp.float32), 1.0))
    np.testing.assert_array_equal(got, ref_keep)
