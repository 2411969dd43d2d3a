"""Golden tests, wave 2: more reference modules imported from
/root/reference under sys.modules shims (see helpers/refshim.py) and
matched numerically against the nesie_tpu ports.

Covered here: box corner geometry + Box3DMode conversions
(box_3d_mode.py), structure utils (rotation_3d_in_axis / limit_period),
Integral / AngleIntegral distribution decoders (nesie_head.py:19,
saqe_head.py:54), gaussian heatmap utils (core/utils/gaussian.py), the
real anchor generators (core/anchor/anchor_3d_generator.py — upgrading
the hand-ported torch oracle in test_extras.py), and
axis_aligned_bbox_overlaps_3d (iou3d_calculator.py:201).
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

import jax.numpy as jnp  # noqa: E402


def _stub_pkg(name, **attrs):
    if name not in sys.modules:
        m = types.ModuleType(name)
        m.__path__ = []
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(sys.modules[name], k, v)
    return sys.modules[name]


# --------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def ref_boxes():
    """All three reference box classes + Box3DMode, CUDA imports stubbed."""
    refshim.install_shims()
    _stub_pkg("mmdet3d")
    _stub_pkg("mmdet3d.core")
    _stub_pkg("mmdet3d.core.points", BasePoints=object)
    _stub_pkg("mmdet3d.ops", points_in_boxes_batch=None)
    _stub_pkg("mmdet3d.ops.iou3d", iou3d_cuda=None)
    _stub_pkg("mmdet3d.ops.roiaware_pool3d", points_in_boxes_gpu=None)
    load_ref("mmdet3d/core/bbox/structures/utils.py", "refboxes.utils")
    load_ref("mmdet3d/core/bbox/structures/base_box3d.py",
             "refboxes.base_box3d")
    load_ref("mmdet3d/core/bbox/structures/depth_box3d.py",
             "refboxes.depth_box3d")
    load_ref("mmdet3d/core/bbox/structures/cam_box3d.py",
             "refboxes.cam_box3d")
    load_ref("mmdet3d/core/bbox/structures/lidar_box3d.py",
             "refboxes.lidar_box3d")
    return load_ref("mmdet3d/core/bbox/structures/box_3d_mode.py",
                    "refboxes.box_3d_mode")


@pytest.fixture(scope="module")
def ref_struct_utils(ref_boxes):
    return sys.modules["refboxes.utils"]


@pytest.fixture(scope="module")
def ref_nesie_head(ref_boxes):
    """nesie_head.py imported whole; only the pure-torch pieces are used."""
    refshim.install_shims()
    _stub_pkg("mmdet3d.core.post_processing", aligned_3d_nms=None)
    _stub_pkg("mmdet3d.models")
    _stub_pkg("mmdet3d.models.builder", build_loss=lambda cfg: None)
    _stub_pkg("mmdet3d.models.losses", chamfer_distance=None)
    _stub_pkg("mmdet3d.models.model_utils", VoteModule=object)
    _stub_pkg("mmdet3d.ops", build_sa_module=None, furthest_point_sample=None)
    _stub_pkg("mmdet3d.ops.rotated_iou", cal_giou_3d=None, cal_iou_3d=None)
    sys.modules["mmdet3d.core"].DepthInstance3DBoxes = sys.modules[
        "refboxes.depth_box3d"].DepthInstance3DBoxes
    sys.modules["mmdet.models"].HEADS = refshim._Registry()
    reliable = types.ModuleType("refheads.reliable_conv_bbox_module")
    reliable.ReliableConvBboxHead = object
    side = types.ModuleType("refheads.side_pooling_module")
    side.SidePooling = object
    quality = types.ModuleType("refheads.quelity_estimation_module")
    quality.QualityEstimation = object
    return load_ref(
        "mmdet3d/models/dense_heads/nesie_head.py", "refheads.nesie_head",
        package_modules={"reliable_conv_bbox_module": reliable,
                         "side_pooling_module": side})


@pytest.fixture(scope="module")
def ref_saqe_head(ref_nesie_head):
    reliable = sys.modules["refheads.reliable_conv_bbox_module"]
    side = sys.modules["refheads.side_pooling_module"]
    quality = types.ModuleType("refheads.quelity_estimation_module")
    quality.QualityEstimation = object
    return load_ref(
        "mmdet3d/models/dense_heads/saqe_head.py", "refheads.saqe_head",
        package_modules={"reliable_conv_bbox_module": reliable,
                         "side_pooling_module": side,
                         "quelity_estimation_module": quality})


@pytest.fixture(scope="module")
def ref_gaussian():
    return load_ref("mmdet3d/core/utils/gaussian.py", "ref_gaussian")


@pytest.fixture(scope="module")
def ref_anchor():
    refshim.install_shims()
    mmcv = sys.modules["mmcv"]
    if not hasattr(mmcv, "is_list_of"):
        mmcv.is_list_of = lambda seq, t: isinstance(seq, list) and all(
            isinstance(x, t) for x in seq)
    _stub_pkg("mmdet.core")
    _stub_pkg("mmdet.core.anchor", ANCHOR_GENERATORS=refshim._Registry())
    return load_ref("mmdet3d/core/anchor/anchor_3d_generator.py",
                    "ref_anchor_3d_generator")


@pytest.fixture(scope="module")
def ref_iou_calc():
    refshim.install_shims()
    _stub_pkg("mmdet.core")
    _stub_pkg("mmdet.core.bbox", bbox_overlaps=None)
    _stub_pkg("mmdet.core.bbox.iou_calculators")
    _stub_pkg("mmdet.core.bbox.iou_calculators.builder",
              IOU_CALCULATORS=refshim._Registry())
    _stub_pkg("refcalc")
    _stub_pkg("refcalc.structures", get_box_type=None)
    return load_ref("mmdet3d/core/bbox/iou_calculators/iou3d_calculator.py",
                    "refcalc.iou_calculators.iou3d_calculator")


# ----------------------------------------------------------- structure utils
def test_limit_period_matches_reference(ref_struct_utils):
    from nesie_tpu.core.boxes import limit_period

    rng = np.random.default_rng(0)
    vals = rng.uniform(-12, 12, (257,)).astype(np.float32)
    for offset, period in ((0.5, np.pi), (0.0, 2 * np.pi), (0.5, 2 * np.pi)):
        want = ref_struct_utils.limit_period(
            torch.from_numpy(vals), offset, period).numpy()
        got = np.asarray(limit_period(jnp.asarray(vals), offset, period))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_rotation_3d_in_axis_z_matches_reference(ref_struct_utils):
    from nesie_tpu.core.boxes import rotate_points_z

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(7, 11, 3)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, (7,)).astype(np.float32)
    want = ref_struct_utils.rotation_3d_in_axis(
        torch.from_numpy(pts), torch.from_numpy(ang), axis=2).numpy()
    got = np.asarray(rotate_points_z(jnp.asarray(pts), jnp.asarray(ang)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------------ corners
def _rand_bottom_boxes(rng, n):
    b = np.zeros((n, 7), np.float32)
    b[:, :3] = rng.uniform(-4, 4, (n, 3))
    b[:, 3:6] = rng.uniform(0.2, 3.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_depth_corners_match_reference(ref_boxes):
    from nesie_tpu.core.boxes import box_corners

    rng = np.random.default_rng(2)
    bottom = _rand_bottom_boxes(rng, 33)
    Depth = sys.modules["refboxes.depth_box3d"].DepthInstance3DBoxes
    want = Depth(torch.from_numpy(bottom.copy())).corners.numpy()

    gravity = bottom.copy()
    gravity[:, 2] += 0.5 * gravity[:, 5]
    got = np.asarray(box_corners(jnp.asarray(gravity)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_corners_minmax_matches_reference_standup(ref_boxes,
                                                  ref_struct_utils):
    """corners -> axis-aligned standup box vs the torch corner min/max."""
    from nesie_tpu.core.boxes import box_corners, corners_minmax

    rng = np.random.default_rng(3)
    bottom = _rand_bottom_boxes(rng, 17)
    Depth = sys.modules["refboxes.depth_box3d"].DepthInstance3DBoxes
    c = Depth(torch.from_numpy(bottom.copy())).corners
    want = torch.cat([c.min(dim=1).values, c.max(dim=1).values], -1).numpy()

    gravity = bottom.copy()
    gravity[:, 2] += 0.5 * gravity[:, 5]
    got = np.asarray(corners_minmax(box_corners(jnp.asarray(gravity))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ mode convert
@pytest.mark.parametrize("src,dst,port", [
    ("DEPTH", "LIDAR", "depth_to_lidar"),
    ("LIDAR", "DEPTH", "lidar_to_depth"),
    ("DEPTH", "CAM", "depth_to_cam"),
    ("CAM", "DEPTH", "cam_to_depth"),
    ("LIDAR", "CAM", "lidar_to_cam"),
    ("CAM", "LIDAR", "cam_to_lidar"),
])
def test_box3d_mode_convert_matches_reference(ref_boxes, src, dst, port):
    import nesie_tpu.core.box_modes as box_modes

    Mode = ref_boxes.Box3DMode
    rng = np.random.default_rng(4)
    boxes = _rand_bottom_boxes(rng, 29)
    want = Mode.convert(boxes.copy(), getattr(Mode, src), getattr(Mode, dst))
    got = np.asarray(getattr(box_modes, port)(jnp.asarray(boxes)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_box3d_mode_round_trips(ref_boxes):
    """Every convert pair is an exact inverse in both codebases."""
    import nesie_tpu.core.box_modes as box_modes

    rng = np.random.default_rng(5)
    boxes = jnp.asarray(_rand_bottom_boxes(rng, 13))
    for fwd, inv in (("depth_to_lidar", "lidar_to_depth"),
                     ("depth_to_cam", "cam_to_depth"),
                     ("lidar_to_cam", "cam_to_lidar")):
        back = getattr(box_modes, inv)(getattr(box_modes, fwd)(boxes))
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   rtol=1e-6, atol=1e-6)


# ------------------------------------------------------- Integral decoders
def test_integral_matches_reference(ref_nesie_head):
    from nesie_tpu.nn.heads import integral_expectation

    reg_max = 16
    layer = ref_nesie_head.Integral(reg_max)
    rng = np.random.default_rng(6)
    logits = rng.normal(scale=3.0, size=(5, 6 * (reg_max + 1))).astype(
        np.float32)
    want = layer(torch.from_numpy(logits)).detach().numpy()
    got = np.asarray(integral_expectation(
        jnp.asarray(logits).reshape(5, 6, reg_max + 1), reg_max)).reshape(
            want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_angle_integral_matches_reference(ref_saqe_head):
    """AngleIntegral + the side2box scaling (saqe_head.py:206-207)."""
    from nesie_tpu.nn.heads import angle_integral_expectation

    reg_max = 12
    layer = ref_saqe_head.AngleIntegral(reg_max)
    rng = np.random.default_rng(7)
    logits = rng.normal(scale=2.0, size=(9, reg_max + 1)).astype(np.float32)
    want = layer(torch.from_numpy(logits)).detach().numpy().reshape(-1)
    want = want * 2 * np.pi
    want[want > np.pi] -= 2 * np.pi
    got = np.asarray(angle_integral_expectation(jnp.asarray(logits)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- gaussians
def test_gaussian_2d_matches_reference(ref_gaussian):
    from nesie_tpu.core.gaussian import gaussian_2d

    for shape, sigma in (((7, 7), 7 / 6), ((5, 9), 2.0), ((1, 1), 1.0)):
        want = ref_gaussian.gaussian_2d(shape, sigma)
        got = np.asarray(gaussian_2d(shape, sigma))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_gaussian_radius_matches_reference(ref_gaussian):
    from nesie_tpu.core.gaussian import gaussian_radius

    rng = np.random.default_rng(8)
    for _ in range(20):
        h, w = rng.uniform(1, 40, 2)
        for overlap in (0.3, 0.5, 0.7):
            want = ref_gaussian.gaussian_radius(
                (torch.tensor(h), torch.tensor(w)), overlap).item()
            got = float(gaussian_radius((h, w), overlap))
            np.testing.assert_allclose(got, want, rtol=1e-5)


def test_draw_heatmap_gaussian_matches_reference(ref_gaussian):
    from nesie_tpu.core.gaussian import draw_heatmap_gaussian

    rng = np.random.default_rng(9)
    base = rng.uniform(0, 0.4, (24, 32)).astype(np.float32)
    # interior, edge-clipped, and corner-clipped splats
    for center, radius, k in (((10, 12), 3, 1.0), ((1, 2), 4, 0.7),
                              ((30, 22), 5, 1.0), ((0, 0), 2, 1.0)):
        want = ref_gaussian.draw_heatmap_gaussian(
            torch.from_numpy(base.copy()),
            torch.tensor(center, dtype=torch.float32), radius, k).numpy()
        got = np.asarray(draw_heatmap_gaussian(
            jnp.asarray(base), center, radius, k))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- anchor generators
def test_anchor_generator_matches_reference_import(ref_anchor):
    """The real anchor_3d_generator.py running on CPU vs core/anchors
    (strictly stronger than the hand-ported oracle in test_extras.py)."""
    from nesie_tpu.core.anchors import (
        AlignedAnchor3DRangeGenerator,
        Anchor3DRangeGenerator,
    )

    ranges = [[0, -40, -3, 70, 40, 1], [0, -40, -1.8, 70, 40, 2.2]]
    sizes = [[1.6, 3.9, 1.56], [0.6, 0.8, 1.73]]
    fs = [(2, 4, 5)]
    for ref_cls, port_cls in (
            (ref_anchor.Anchor3DRangeGenerator, Anchor3DRangeGenerator),
            (ref_anchor.AlignedAnchor3DRangeGenerator,
             AlignedAnchor3DRangeGenerator)):
        ref_gen = ref_cls(ranges=ranges, sizes=sizes,
                          rotations=[0, 1.5707963])
        want = ref_gen.grid_anchors(fs, device="cpu")[0].numpy()
        got = np.asarray(
            port_cls(ranges=ranges, sizes=sizes,
                     rotations=[0, 1.5707963]).grid_anchors(fs)[0])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_anchor_generator_custom_values_match_reference(ref_anchor):
    from nesie_tpu.core.anchors import Anchor3DRangeGenerator

    ranges = [[-10, -10, -1, 10, 10, 1]]
    sizes = [[1.0, 2.0, 1.5]]
    fs = [(1, 3, 3)]
    ref_gen = ref_anchor.Anchor3DRangeGenerator(
        ranges=ranges, sizes=sizes, custom_values=(0.0, 0.0))
    want = ref_gen.grid_anchors(fs, device="cpu")[0].numpy()
    got = np.asarray(Anchor3DRangeGenerator(
        ranges=ranges, sizes=sizes,
        custom_values=(0.0, 0.0)).grid_anchors(fs)[0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_anchor_generator_per_cls_matches_reference(ref_anchor):
    from nesie_tpu.core.anchors import AlignedAnchor3DRangeGeneratorPerCls

    ranges = [[0, 0, -1, 8, 8, 1], [0, 0, -1, 4, 4, 1]]
    sizes = [[1, 1, 1], [2, 2, 2]]
    fs = [[(1, 4, 4), (1, 2, 2)]]
    ref_gen = ref_anchor.AlignedAnchor3DRangeGeneratorPerCls(
        ranges=ranges, sizes=sizes, rotations=[0.0, 1.5707963])
    want = ref_gen.grid_anchors(fs[0], device="cpu")
    got = AlignedAnchor3DRangeGeneratorPerCls(
        ranges=ranges, sizes=sizes,
        rotations=[0.0, 1.5707963]).grid_anchors(fs[0])
    assert len(want) == len(got) == 1
    for w, g in zip(want[0], got[0]):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), rtol=1e-5,
                                   atol=1e-5)


# --------------------------------------------------- axis-aligned overlaps
def _rand_aabb(rng, shape):
    lo = rng.uniform(-4, 3, shape + (3,))
    hi = lo + rng.uniform(0.1, 3, shape + (3,))
    return np.concatenate([lo, hi], -1).astype(np.float32)


# ------------------------------------------------- full decode+NMS path
def _torch_points_in_boxes_batch(points, boxes):
    """Faithful torch replica of the CUDA points_in_boxes_batch kernel
    (roiaware_pool3d/src/points_in_boxes_cuda.cu:24-49): z inclusive of
    both faces, xy strictly inside, LiDAR->local rotation by rz + pi/2.

    The only non-reference code on the oracle side of the get_bboxes
    test; its semantics are themselves pinned in tests/test_boxes.py.
    """
    import math

    pts, bx = points[0], boxes[0]
    dz = pts[:, None, 2] - (bx[None, :, 2] + bx[None, :, 5] / 2)
    z_in = dz.abs() <= bx[None, :, 5] / 2
    rot = bx[:, 6] + math.pi / 2
    cosa, sina = torch.cos(rot)[None], torch.sin(rot)[None]
    dx = pts[:, None, 0] - bx[None, :, 0]
    dy = pts[:, None, 1] - bx[None, :, 1]
    lx = dx * cosa - dy * sina
    ly = dx * sina + dy * cosa
    half_l, half_w = bx[None, :, 4] / 2, bx[None, :, 3] / 2
    xy_in = (lx > -half_l) & (lx < half_l) & (ly > -half_w) & (ly < half_w)
    return (z_in & xy_in)[None].to(torch.int32)


@pytest.fixture(scope="module")
def ref_get_bboxes(ref_nesie_head):
    """NesieHead.get_bboxes on a bare instance with the real
    aligned_3d_nms and real DepthInstance3DBoxes wired in."""
    _stub_pkg("mmdet3d.ops.iou3d.iou3d_utils", nms_gpu=None,
              nms_normal_gpu=None)
    nms_mod = load_ref("mmdet3d/core/post_processing/box3d_nms.py",
                       "ref_box3d_nms")
    ref_nesie_head.aligned_3d_nms = nms_mod.aligned_3d_nms
    sys.modules["mmdet3d.ops"].points_in_boxes_batch = (
        _torch_points_in_boxes_batch)
    # depth_box3d bound the name at import time
    sys.modules["refboxes.depth_box3d"].points_in_boxes_batch = (
        _torch_points_in_boxes_batch)
    return ref_nesie_head


@pytest.mark.parametrize("with_yaw", [False, True])
def test_get_bboxes_matches_reference(ref_get_bboxes, with_yaw):
    """End-to-end eval decode: softmax scoring + iou reweighting +
    nonempty filter + aligned NMS + score threshold + per-class proposal
    expansion (nesie_head.py:681-788) vs decode_and_nms/expand_per_class,
    with axis-aligned (ScanNet) and yawed (SUN RGB-D) proposals."""
    from types import SimpleNamespace

    from nesie_tpu.eval.postprocess import decode_and_nms, expand_per_class

    rng = np.random.default_rng(11)
    B, P, C, N = 2, 24, 5, 4000
    results = {
        "obj_scores": rng.normal(size=(B, P, 2)).astype(np.float32),
        "sem_scores": rng.normal(size=(B, P, C)).astype(np.float32),
        "iou_scores": rng.uniform(0.1, 1.0, (B, P, C)).astype(np.float32),
    }
    boxes = np.zeros((B, P, 7), np.float32)
    boxes[..., :3] = rng.uniform(-3, 3, (B, P, 3))
    boxes[..., 3:6] = rng.uniform(0.4, 2.0, (B, P, 3))
    if with_yaw:
        boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, P))
    results["bbox_preds"] = boxes
    # clouds dense enough that some boxes pass the >5-point filter
    points = rng.uniform(-3.5, 3.5, (B, N, 3)).astype(np.float32)

    head = ref_get_bboxes.NesieHead.__new__(ref_get_bboxes.NesieHead)
    head.test_cfg = SimpleNamespace(nms_thr=0.25, score_thr=0.05,
                                    per_class_proposal=True)
    head.num_classes = C
    Depth = sys.modules["refboxes.depth_box3d"].DepthInstance3DBoxes
    torch_preds = {k: torch.from_numpy(v) for k, v in results.items()}
    want = head.get_bboxes(
        torch.from_numpy(points), torch_preds,
        [{"box_type_3d": Depth}] * B)

    import jax.numpy as jnp
    decoded = decode_and_nms(
        {k: jnp.asarray(v) for k, v in results.items()},
        jnp.asarray(points), nms_thr=0.25, score_thr=0.05,
        use_iou_for_nms=True)

    picked_any = 0
    for b in range(B):
        got_boxes, got_scores, got_labels = expand_per_class(
            {k: np.asarray(v[b]) for k, v in decoded.items()})
        want_boxes = want[b][0].tensor.numpy()  # bottom-centered
        want_boxes[:, 2] += 0.5 * want_boxes[:, 5]  # -> gravity
        assert got_boxes.shape == want_boxes.shape
        np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(got_scores, want[b][1].numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(got_labels, want[b][2].numpy())
        picked_any += len(got_scores)
    assert picked_any > 0  # the fixture must actually select proposals


@pytest.mark.parametrize("mode", ["iou", "giou"])
@pytest.mark.parametrize("aligned", [False, True])
def test_axis_aligned_overlaps_match_reference(ref_iou_calc, mode, aligned):
    from nesie_tpu.core.iou import axis_aligned_overlap_3d

    rng = np.random.default_rng(10)
    b1 = _rand_aabb(rng, (2, 9))
    b2 = _rand_aabb(rng, (2, 9) if aligned else (2, 6))
    want = ref_iou_calc.axis_aligned_bbox_overlaps_3d(
        torch.from_numpy(b1), torch.from_numpy(b2), mode=mode,
        is_aligned=aligned).numpy()
    got = np.asarray(axis_aligned_overlap_3d(
        jnp.asarray(b1), jnp.asarray(b2), aligned=aligned, mode=mode))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
