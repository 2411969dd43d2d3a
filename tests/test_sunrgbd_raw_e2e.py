"""SUN RGB-D format-level end-to-end: build a tiny synthetic *raw*
sunrgbd_trainval tree (16-bit bit-packed depth PNGs + MATLAB column-major
calib txts + VoteNet label txts — the formats consumed by the reference's
data/sunrgbd/matlab/extract_rgbd_data_v2.m pipeline), run
data/sunrgbd_prep.py over it, and verify:

  * the depth -> gravity-aligned-cloud math (SUNRGBD toolbox
    ``read3dPoints`` conventions: bit shuffle, pinhole back-projection,
    camera [x, z, -y] permutation, Rtilt) round-trips known world geometry,
  * a flat floor comes out at constant z (gravity alignment under a tilted
    Rtilt),
  * labeled objects are recovered where the labels say (points-in-box),
  * the exported infos drive a with_yaw=True pretrain smoke + eval through
    the production runner.
"""
from __future__ import annotations

import numpy as np
import pytest

from nesie_tpu.data.sunrgbd_prep import (decode_sunrgbd_depth,
                                         depth_to_points, export_sample,
                                         read_calib, write_infos)

H, W = 96, 128
FX = FY = 110.0
CX, CY = W / 2.0, H / 2.0


def _rtilt(tilt_deg=-12.0):  # negative = camera pitched down at the floor
    """Gravity tilt about the camera x-axis (typical SUN RGB-D Rtilt)."""
    t = np.deg2rad(tilt_deg)
    c, s = np.cos(t), np.sin(t)
    return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])


def _world_to_depth_map(world):
    """Inverse of the prep pipeline: world points -> (H, W) raw uint16
    bit-packed depth map + the subset of world points that actually landed
    on distinct pixels (nearest wins)."""
    rtilt = _rtilt()
    cam = world @ rtilt  # inverse of (cam @ rtilt.T)
    x, d, neg_y = cam[:, 0], cam[:, 1], cam[:, 2]
    y = -neg_y
    ok = d > 0.2
    x, y, d, world = x[ok], y[ok], d[ok], world[ok]
    u = np.round(x * FX / d + CX).astype(int)
    v = np.round(y * FY / d + CY).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    u, v, d, world = u[ok], v[ok], d[ok], world[ok]
    depth = np.zeros((H, W), np.float64)
    # nearest point wins per pixel
    order = np.argsort(-d)
    depth[v[order], u[order]] = d[order]
    d_mm = np.clip(np.round(depth * 1000), 0, 8000).astype(np.uint16)
    raw = np.bitwise_or(np.left_shift(d_mm, 3),
                        np.right_shift(d_mm, 16 - 3)).astype(np.uint16)
    return raw, world


def _box_surface_points(center, size, n=400, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(n, 3)) * size
    ax = rng.integers(0, 3, size=n)
    sign = rng.choice([-0.5, 0.5], size=n)
    pts[np.arange(n), ax] = sign[np.arange(n)] * size[ax]
    return pts + center


FLOOR_Z = -1.0  # camera (= world origin) sits 1 m above the floor


def _analytic_floor_depth():
    """Per-pixel depth of the z=FLOOR_Z plane through the tilted camera:
    the ray through pixel (u, v) is d * [a, 1, b] in camera coords
    (a=(u-cx)/fx, b=-(v-cy)/fy), and world_z = d * (a*R20 + R21 + b*R22)."""
    rtilt = _rtilt()
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    a = (u - CX) / FX
    b = -(v - CY) / FY
    denom = a * rtilt[2, 0] + rtilt[2, 1] + b * rtilt[2, 2]
    with np.errstate(divide="ignore"):
        d = FLOOR_Z / denom
    d[(denom >= -1e-6) | (d <= 0.2) | (d > 7.5)] = 0.0
    return d


def _write_raw_tree(root, n_samples=4):
    from PIL import Image

    rtilt = _rtilt()
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    rng = np.random.default_rng(42)
    gt = {}
    for i in range(n_samples):
        sid = f"{i:06d}"
        # analytic floor plane depth + one splatted box object per scene
        depth = _analytic_floor_depth().copy()
        center = np.array([rng.uniform(-1, 1), rng.uniform(1.8, 3.2),
                           FLOOR_Z + rng.uniform(0.3, 0.5)])
        size = np.array([0.8, 0.7, 0.6])
        obj = _box_surface_points(center, size, n=3000, rng=rng)
        raw_obj, _ = _world_to_depth_map(obj)
        d_obj = decode_sunrgbd_depth(raw_obj)
        nearer = (d_obj > 0) & ((depth == 0) | (d_obj < depth))
        depth[nearer] = d_obj[nearer]
        d_mm = np.clip(np.round(depth * 1000), 0, 8000).astype(np.uint16)
        raw = np.bitwise_or(np.left_shift(d_mm, 3),
                            np.right_shift(d_mm, 16 - 3)).astype(np.uint16)

        (root / "depth").mkdir(parents=True, exist_ok=True)
        (root / "calib").mkdir(exist_ok=True)
        (root / "label").mkdir(exist_ok=True)
        Image.fromarray(raw, mode="I;16").save(root / "depth" / f"{sid}.png")
        # MATLAB writes matrices column-major (read_calib reshapes order='F')
        (root / "calib" / f"{sid}.txt").write_text(
            " ".join(f"{x:.9f}" for x in rtilt.flatten(order="F")) + "\n"
            + " ".join(f"{x:.6f}" for x in K.flatten(order="F")) + "\n")
        heading = 0.0
        ox, oy = np.cos(-heading), np.sin(-heading)
        # VoteNet label: class 2d-bbox centroid half-sizes orientation
        (root / "label" / f"{sid}.txt").write_text(
            f"chair 0 0 10 10 {center[0]:.4f} {center[1]:.4f} "
            f"{center[2]:.4f} {size[0]/2:.4f} {size[1]/2:.4f} "
            f"{size[2]/2:.4f} {ox:.4f} {oy:.4f}\n")
        gt[sid] = (center, size)
    return gt


def test_depth_decode_roundtrip():
    rng = np.random.default_rng(0)
    d_mm = rng.integers(0, 8000, size=(30, 40)).astype(np.uint16)
    raw = np.bitwise_or(np.left_shift(d_mm, 3),
                        np.right_shift(d_mm, 16 - 3)).astype(np.uint16)
    meters = decode_sunrgbd_depth(raw)
    np.testing.assert_allclose(meters, d_mm / 1000.0, atol=1e-6)


def test_raw_tree_export_geometry(tmp_path):
    gt = _write_raw_tree(tmp_path, n_samples=2)
    for sid, (center, size) in gt.items():
        sample = export_sample(tmp_path, sid)
        pts = sample["points"]
        assert len(pts) > 3000

        # gravity alignment: the z=FLOOR_Z plane must come back flat
        # despite the 12-degree camera tilt (depth quantization is 1mm;
        # projection+rounding adds a few cm)
        floor = pts[pts[:, 2] < FLOOR_Z + 0.15]
        assert len(floor) > 1500
        assert abs(np.median(floor[:, 2]) - FLOOR_Z) < 0.03
        assert np.std(floor[:, 2]) < 0.05  # flat, not tilted

        # the labeled box must contain its object's points
        boxes, labels = sample["boxes"], sample["labels"]
        assert labels.tolist() == [3]  # chair
        np.testing.assert_allclose(boxes[0, :3], center, atol=1e-3)
        lo = center - size / 2 - 0.08
        hi = center + size / 2 + 0.08
        inside = np.all((pts >= lo) & (pts <= hi), axis=1)
        obj_pts = pts[pts[:, 2] > FLOOR_Z + 0.12]
        assert inside.sum() >= 0.5 * max(len(obj_pts), 1)


def test_raw_tree_pretrain_and_eval(tmp_path):
    """Raw tree -> prep -> infos -> with_yaw pretrain smoke + eval mAP
    through the production runner."""
    import dataclasses

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import SUNRGBDScenes, SubSUNRGBDScenes
    from nesie_tpu.train import runner

    _write_raw_tree(tmp_path, n_samples=4)
    samples = [(f"{i:06d}", export_sample(tmp_path, f"{i:06d}"))
               for i in range(4)]
    write_infos(samples[:3], tmp_path, "train")
    write_infos(samples[3:], tmp_path, "val")
    split = tmp_path / "split_0.1.txt"
    split.write_text("000000\n000001\n000002\n")

    cfg = get_config("nesie-votenet-sunrgbd-pretrain-010")
    # the sunrgbd family trains yawed boxes (heading not zeroed)
    assert cfg.model.dataset_name == "SUNRGBD"
    cfg = apply_overrides(cfg, [
        "optim.max_epochs=1", "data.repeat=1", "data.num_points=1024",
        "data.samples_per_step=2", "log_interval=1",
        "model.num_proposal=16", "model.reg_max=8",
        "model.num_points=(64,32,16,16)", "model.num_samples=(8,8,4,4)",
        "model.sa_channels=((16,16,32),(32,32,32),(32,32,32),(32,32,32))",
        "model.fp_channels=((32,32),(32,32))",
        "checkpoint_interval_epochs=1000",
    ])
    cfg = dataclasses.replace(cfg, num_devices=1, work_dir=str(tmp_path))
    ds = SubSUNRGBDScenes(tmp_path, tmp_path / "sunrgbd_infos_train.pkl",
                          split)
    assert len(ds) == 3
    model = runner.build_model(cfg)
    state = runner.train_supervised(cfg, ds)
    assert int(state.step) >= 1

    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent / "tools"))
    from validation_run import eval_mAP

    val = SUNRGBDScenes(tmp_path, tmp_path / "sunrgbd_infos_val.pkl")
    res = eval_mAP(cfg, model, state, val, num_points=1024, batch=1)
    assert np.isfinite(res["mAP_0.25"])
