"""Data-layer tests: io primitives, datasets, synthetic scenes, prep."""
import pickle

import numpy as np
import pytest

from nesie_tpu.data import io
from nesie_tpu.data.dataset import (
    ScanNetScenes,
    SimiScanNetScenes,
    SubScanNetScenes,
)
from nesie_tpu.data.synthetic import make_synthetic_scenes


def test_add_height():
    pts = np.zeros((100, 3), np.float32)
    pts[:, 2] = np.linspace(0, 3, 100)
    out = io.add_height(pts)
    assert out.shape == (100, 4)
    floor = np.percentile(pts[:, 2], 0.99)
    np.testing.assert_allclose(out[:, 3], pts[:, 2] - floor, atol=1e-6)


def test_global_alignment():
    pts = np.array([[1.0, 0, 0, 9.0]], np.float32)
    m = np.eye(4)
    m[:3, 3] = [1, 2, 3]
    out = io.global_alignment(pts, m)
    np.testing.assert_allclose(out[0], [2, 2, 3, 9], atol=1e-6)


def test_sample_points_replacement():
    rng = np.random.default_rng(0)
    pts = np.arange(30, dtype=np.float32).reshape(10, 3)
    out = io.sample_points(pts, 25, rng)  # fewer points than requested
    assert out.shape == (25, 3)
    out2 = io.sample_points(pts, 5, rng)
    assert len(np.unique(out2, axis=0)) == 5


def test_scene_from_info_gravity_to_bottom(tmp_path):
    info = dict(
        point_cloud=dict(num_features=6, lidar_idx="scene0000_00"),
        pts_path="points/scene0000_00.bin",
        annos={
            "gt_num": 1,
            "gt_boxes_upright_depth": np.array([[1, 2, 1.0, 1, 1, 2.0]]),
            "class": np.array([3]),
            "axis_align_matrix": np.eye(4),
        },
    )
    _, boxes, labels, _ = io.scene_from_info(info, tmp_path)
    np.testing.assert_allclose(boxes[0], [1, 2, 0.0, 1, 1, 2, 0])  # z -> bottom
    assert labels[0] == 3


def test_synthetic_dataset_batches():
    scenes = make_synthetic_scenes(6, num_classes=4)
    ds = ScanNetScenes(scenes=scenes)
    rng = np.random.default_rng(0)
    batch = ds.eval_batch([0, 1], rng, num_points=2048)
    assert batch["points"].shape == (2, 2048, 4)
    assert batch["gt_boxes"].shape == (2, 64, 7)
    assert batch["gt_valid"].sum() > 0
    # GT points actually inside room bounds
    assert np.abs(batch["gt_boxes"][batch["gt_valid"]][:, :2]).max() < 4


def test_simi_dataset_semi_batch():
    scenes = make_synthetic_scenes(8, num_classes=4)
    labeled = [s.scene_id for s in scenes[:3]]
    ds = SimiScanNetScenes(scenes=scenes, labeled_ids=labeled, ratio=2)
    assert ds.num_labeled == 3
    assert ds.num_unlabeled == 8
    rng = np.random.default_rng(0)
    batch = ds.semi_batch([0, 1], rng, num_points=1024)
    assert batch["points_raw_s"].shape == (6, 1024, 4)
    assert batch["points_raw_t"].shape == (6, 1024, 4)
    # strong and weak views differ (independent subsamples)
    assert not np.allclose(batch["points_raw_s"], batch["points_raw_t"])
    assert batch["aug_s"].rot.shape == (6,)
    # weak aug has no rotation/scale/translation
    np.testing.assert_allclose(batch["aug_t"].rot, 0)
    np.testing.assert_allclose(batch["aug_t"].scale, 1)
    hist = ds.labeled_class_histogram(4)
    assert hist.shape == (3, 4)
    assert hist.sum() == sum(len(s.labels) for s in scenes[:3])


def test_sub_dataset_filters():
    scenes = make_synthetic_scenes(5, num_classes=4)
    ds = SubScanNetScenes(scenes=scenes, labeled_ids=[scenes[0].scene_id, scenes[2].scene_id])
    assert len(ds) == 2


def test_ply_roundtrip(tmp_path):
    from nesie_tpu.data.scannet_prep import read_ply_vertices

    # write a minimal binary PLY
    n = 7
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype("<f4")
    rgb = rng.integers(0, 255, (n, 3)).astype("u1")
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    path = tmp_path / "test.ply"
    with open(path, "wb") as f:
        f.write(header.encode())
        dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                       ("red", "u1"), ("green", "u1"), ("blue", "u1")])
        rec = np.zeros(n, dt)
        rec["x"], rec["y"], rec["z"] = xyz.T
        rec["red"], rec["green"], rec["blue"] = rgb.T
        f.write(rec.tobytes())
    v = read_ply_vertices(path)
    np.testing.assert_allclose(v["x"], xyz[:, 0], atol=1e-6)
    np.testing.assert_array_equal(v["green"], rgb[:, 1])


def test_write_and_load_infos(tmp_path):
    from nesie_tpu.data import scannet_prep

    data = dict(
        points=np.random.default_rng(0).normal(size=(100, 6)).astype(np.float32),
        boxes=np.array([[0, 0, 1.0, 1, 1, 2, 4]], np.float32),  # nyu40 id 4=bed
        axis_align_matrix=np.eye(4, dtype=np.float32),
        instance_ids=np.zeros(100, np.int64),
        semantic_ids=np.zeros(100, np.int64),
    )
    scannet_prep.write_infos([("scene0000_00", data)], tmp_path, "train")
    ds = ScanNetScenes(tmp_path, tmp_path / "scannet_infos_train.pkl")
    assert len(ds) == 1
    s = ds.scenes[0]
    assert s.labels[0] == 1  # nyu40 4 (bed) -> class index 1
    np.testing.assert_allclose(s.boxes[0, 2], 0.0)  # bottom z
    rng = np.random.default_rng(0)
    pts = ds.load_points(s, rng, num_points=64)
    assert pts.shape == (64, 4)


def test_outdoor_transforms():
    from nesie_tpu.data.outdoor_transforms import (
        object_noise, object_range_filter, points_range_filter,
    )

    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, (500, 4)).astype(np.float32)
    kept = points_range_filter(pts, (-1, -1, -5, 1, 1, 5))
    assert (np.abs(kept[:, :2]) <= 1).all()

    boxes = np.array([[0, 0, 0, 1, 1, 1, 0], [9, 9, 0, 1, 1, 1, 0]], np.float32)
    labels = np.array([1, 2])
    b, l = object_range_filter(boxes, labels, (-2, -2, 2, 2))
    assert len(b) == 1 and l[0] == 1

    pts2 = np.zeros((10, 3), np.float32)
    pts2[:, 2] = 0.5  # inside box 0
    nb_pts, nb_boxes = object_noise(pts2, boxes[:1].copy(), rng)
    # points moved with the box
    assert not np.allclose(nb_pts, pts2)
    np.testing.assert_allclose(
        nb_pts[:, :3].mean(0)[:2], nb_boxes[0, :2], atol=0.05
    )


def test_sunrgbd_semi_pipeline(tmp_path):
    """SUN RGB-D flows through the same dataset stack: write a synthetic
    sunrgbd infos file with yawed 7-dim boxes via the real info writer,
    then drive SimiSUNRGBDScenes.semi_batch and the sunrgbd config."""
    import numpy as np
    from nesie_tpu.config import get_config
    from nesie_tpu.data.dataset import SimiSUNRGBDScenes
    from nesie_tpu.data.sunrgbd_prep import write_infos

    rng = np.random.default_rng(0)
    samples = []
    for i in range(3):
        pts = rng.uniform(-3, 3, size=(5000, 3)).astype(np.float32)
        boxes = np.array(
            [[0.5, 0.5, 0.4, 1.0, 0.8, 0.8, 0.3],
             [-1.0, -1.0, 0.3, 0.6, 0.6, 0.6, -0.4]], np.float32
        )
        samples.append(
            (f"{i:06d}", dict(points=pts, boxes=boxes,
                              labels=np.array([1, 3], np.int64)))
        )
    write_infos(samples, tmp_path, "train")
    split = tmp_path / "train_0.1.txt"
    split.write_text("000000\n")

    ds = SimiSUNRGBDScenes(
        data_root=tmp_path,
        ann_file=tmp_path / "sunrgbd_infos_train.pkl",
        label_list_file=split,
        ratio=2,
    )
    assert ds.num_labeled == 1 and ds.num_unlabeled == 3
    batch = ds.semi_batch([0], rng, num_points=1024)
    assert batch["points_raw_s"].shape == (3, 1024, 4)
    # yaw survives the info round-trip; z converted gravity -> bottom
    b = ds.scenes[0].boxes
    assert np.allclose(b[0, 6], 0.3) and np.allclose(b[0, 2], 0.0)
    hist = ds.labeled_class_histogram(10)
    assert hist.shape == (1, 10) and hist[0, 1] == 1 and hist[0, 3] == 1

    cfg = get_config("nesie-votenet-sunrgbd-train-010")
    assert cfg.model.num_classes == 10
    assert cfg.data.train_ann_file == "sunrgbd_infos_train.pkl"


def test_reference_test_config_names_resolve():
    """The reference ships {nesie,saqe}-votenet-scannet-test.py = its
    train-010 config with RepeatDataset times=5 (the only diff); the same
    names must resolve here."""
    from nesie_tpu.config import get_config

    for family in ("nesie", "saqe"):
        cfg = get_config(f"{family}-votenet-scannet-test")
        base = get_config(f"{family}-votenet-scannet-train-010")
        assert cfg.data.repeat == 5
        assert cfg.mode == base.mode == "semi"
        assert cfg.model == base.model
        assert cfg.name == f"{family}-votenet-scannet-test"
