"""Offscreen Visualizer (open3d_vis.py parity) and the Mono3D detector
shell (single_stage_mono3d.py parity)."""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def test_offscreen_visualizer_renders_boxes_and_points(tmp_path):
    from nesie_tpu.eval.visualize import Visualizer, show_pts_boxes

    rng = np.random.default_rng(0)
    pts = rng.uniform(-3, 3, size=(3000, 3))
    boxes = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.3],
                      [1.5, 1.0, 0.2, 0.8, 0.6, 0.7, -0.4]])

    vis = Visualizer(pts, bbox3d=boxes, center_mode="lidar_bottom")
    out = tmp_path / "scene.png"
    img = vis.show(str(out))
    assert img.shape == (600, 800, 3) and img.dtype == np.uint8
    assert out.exists() and out.stat().st_size > 0
    red = ((img[..., 0] > 200) & (img[..., 1] < 100)).sum()
    green = ((img[..., 1] > 200) & (img[..., 0] < 100)).sum()
    assert red > 20, "points-in-box recoloring missing"
    assert green > 100, "box wireframes missing"

    vis.add_seg_mask(
        np.concatenate([pts[:400], rng.uniform(0, 1, (400, 3))], axis=1))
    img2 = vis.render()
    assert (img2 != img).any()

    img3 = show_pts_boxes(pts, boxes)
    assert img3.shape == (600, 800, 3)


def test_visualizer_recolor_alignment_and_modes():
    """Pins the review fixes: in-box recoloring must test against the
    gravity-centered extent (not re-shifted by dz/2), camera_bottom shifts
    -dim/2 along rot_axis (open3d_vis.py:97-103), and xyzrgb clouds keep
    their own colors (open3d_vis.py:111)."""
    from nesie_tpu.eval.visualize import Visualizer

    pts = np.array([[0.0, 0.0, 0.25], [0.0, 0.0, 0.75], [0.0, 0.0, 1.25]])
    box = np.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])  # z in [0, 1]
    vis = Visualizer(pts, bbox3d=box, center_mode="lidar_bottom")
    red = np.array([1.0, 0, 0])
    in_box = (vis.colors == red).all(-1)
    np.testing.assert_array_equal(in_box, [True, True, False])

    # camera_bottom: gravity center at rot_axis - dim/2; with rot_axis=2
    # the same box now spans z in [-1, 0] -> only no point is inside
    vis_cam = Visualizer(pts, bbox3d=box, center_mode="camera_bottom")
    assert not (vis_cam.colors == red).all(-1).any()
    pts_neg = np.array([[0.0, 0.0, -0.5]])
    vis_cam2 = Visualizer(pts_neg, bbox3d=box, center_mode="camera_bottom")
    assert (vis_cam2.colors == red).all(-1).all()

    # xyzrgb keeps the cloud's own colors
    rgb = np.concatenate([pts, np.full((3, 3), 0.3)], axis=1)
    vis_rgb = Visualizer(rgb, bbox3d=box, mode="xyzrgb")
    np.testing.assert_allclose(vis_rgb.colors, 0.3)


def test_visualizer_rot_axis_consistency():
    """rot_axis=1 (camera y-up) must rotate the wireframe and run the
    in-box test about that axis: the recolor mask and corner span must be
    the axis-swap of the equivalent z-up scene."""
    from nesie_tpu.eval.visualize import Visualizer

    rng = np.random.default_rng(3)
    pts_z = rng.uniform(-2, 2, size=(500, 3))
    box_z = np.array([[0.3, -0.2, 0.1, 1.6, 0.9, 1.1, 0.7]])
    vis_z = Visualizer(pts_z, bbox3d=box_z, center_mode="lidar_bottom")

    # swap y<->z for points; box center/dims swap, yaw negates (handedness)
    pts_y = pts_z[:, [0, 2, 1]]
    box_y = box_z[:, [0, 2, 1, 3, 5, 4, 6]].copy()
    box_y[:, 6] = -box_y[:, 6]
    vis_y = Visualizer(pts_y, bbox3d=box_y, center_mode="lidar_bottom",
                       rot_axis=1)

    red = np.array([1.0, 0, 0])
    np.testing.assert_array_equal((vis_z.colors == red).all(-1),
                                  (vis_y.colors == red).all(-1))
    cz = vis_z.boxes[0][0]
    cy = vis_y.boxes[0][0]
    np.testing.assert_allclose(np.sort(cy[..., 1].ravel()),
                               np.sort(cz[..., 2].ravel()), atol=1e-5)
    assert (vis_z.colors == red).all(-1).sum() > 0


def test_mono3d_flip_and_merge_semantics():
    from nesie_tpu.nn.mono3d import (flip_mono3d_outputs,
                                     merge_aug_mono3d_outputs)

    rng = np.random.default_rng(1)
    cls0 = [jnp.asarray(rng.normal(size=(1, 4, 6, 8)).astype(np.float32))]
    reg0 = [jnp.asarray(rng.uniform(size=(1, 9, 6, 8)).astype(np.float32))]
    dir0 = [jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))]

    # flipping twice with the channel remap applied is the identity
    cls1, reg1, (dir1,) = flip_mono3d_outputs(cls0, reg0, [dir0],
                                              pred_velo=True)
    cls2, reg2, (dir2,) = flip_mono3d_outputs(cls1, reg1, [dir1],
                                              pred_velo=True)
    np.testing.assert_allclose(np.asarray(cls2[0]), np.asarray(cls0[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(reg2[0]), np.asarray(reg0[0]),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dir2[0]), np.asarray(dir0[0]))

    # merge: cls averaged; reg channels <6 averaged, >=6 kept from view 0;
    # group index ==2 (dir) kept from view 0; groups >=3 (attr/centerness)
    # averaged again (single_stage_mono3d.py:136-157)
    attr0 = [jnp.asarray(rng.normal(size=(1, 3, 6, 8)).astype(np.float32))]
    outs_a = (cls0, reg0, dir0, attr0)
    cls_b = [c + 1.0 for c in cls0]
    reg_b = [r + 1.0 for r in reg0]
    dir_b = [d + 1.0 for d in dir0]
    attr_b = [a + 1.0 for a in attr0]
    merged = merge_aug_mono3d_outputs([outs_a, (cls_b, reg_b, dir_b, attr_b)])
    np.testing.assert_allclose(np.asarray(merged[0][0]),
                               np.asarray(cls0[0]) + 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[1][0][:, :6]),
                               np.asarray(reg0[0][:, :6]) + 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[1][0][:, 6:]),
                               np.asarray(reg0[0][:, 6:]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[2][0]),
                               np.asarray(dir0[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(merged[3][0]),
                               np.asarray(attr0[0]) + 0.5, atol=1e-6)


def test_mono3d_detector_dispatch():
    import flax.linen as nn
    import jax

    from nesie_tpu.nn.mono3d import SingleStageMono3DDetector

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, img, train=False):
            return nn.Conv(8, (3, 3), name="stem")(img)

    class TinyHead(nn.Module):
        @nn.compact
        def __call__(self, feats, train=False):
            cls = nn.Conv(4, (1, 1), name="cls")(feats)
            reg = nn.Conv(9, (1, 1), name="reg")(feats)
            return ([jnp.moveaxis(cls, -1, 1)], [jnp.moveaxis(reg, -1, 1)])

    det = SingleStageMono3DDetector(backbone=TinyBackbone(),
                                    bbox_head=TinyHead())
    img = jnp.zeros((2, 16, 16, 3))
    variables = det.init(jax.random.PRNGKey(0), img)
    cls_maps, reg_maps = det.apply(variables, img)
    assert cls_maps[0].shape == (2, 4, 16, 16)
    assert reg_maps[0].shape == (2, 9, 16, 16)
