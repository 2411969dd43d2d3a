"""GT-paste pipeline: database creation -> DataBaseSampler -> object_sample.

Covers the reference dbsampler.py semantics: round-robin BatchSampler,
rate-scaled per-class deficits, greedy rotated-BEV collision rejection
(with row/col zeroing), box-relative point storage, and ObjectSample's
remove-then-prepend point merge.
"""
import pickle

import numpy as np
import pytest

from nesie_tpu.core.np_box_ops import (
    box_collision_test,
    center_to_corner_box2d,
    points_in_rbbox,
)
from nesie_tpu.data.dbsampler import (
    BatchSampler,
    DataBaseSampler,
    create_gt_database,
)
from nesie_tpu.data.outdoor_transforms import object_sample


def test_batch_sampler_round_robin():
    rng = np.random.default_rng(0)
    s = BatchSampler(list(range(5)), rng)
    first = s.sample(3)
    second = s.sample(3)  # crosses the end -> remainder only (2 items)
    assert len(first) == 3 and len(second) == 2
    assert sorted(first + second) == list(range(5))
    assert len(s.sample(2)) == 2  # reshuffled pool serves again


def test_collision_rotated_vs_separated():
    # two unit squares: touching corners at 45 deg do not collide,
    # overlapping ones do
    a = center_to_corner_box2d(
        np.array([[0.0, 0.0]]), np.array([[1.0, 1.0]]), np.array([0.0])
    )
    b_far = center_to_corner_box2d(
        np.array([[2.0, 0.0]]), np.array([[1.0, 1.0]]), np.array([0.0])
    )
    b_overlap = center_to_corner_box2d(
        np.array([[0.7, 0.0]]), np.array([[1.0, 1.0]]), np.array([np.pi / 4])
    )
    # rotated thin sliver crossing the square without any contained vertex
    b_cross = center_to_corner_box2d(
        np.array([[0.0, 0.0]]), np.array([[4.0, 0.05]]), np.array([np.pi / 6])
    )
    assert not box_collision_test(a, b_far)[0, 0]
    assert box_collision_test(a, b_overlap)[0, 0]
    assert box_collision_test(a, b_cross)[0, 0]


@pytest.fixture
def gt_db(tmp_path):
    """Synthetic 2-scene dataset -> gt database on disk."""
    rng = np.random.default_rng(1)
    classes = ("chair", "table")
    infos = []
    for s in range(2):
        pts = rng.uniform(-4, 4, size=(2000, 6)).astype(np.float32)
        # two gravity-centered boxes with points guaranteed inside
        boxes = np.array(
            [[-2, -2, 0, 1, 1, 1], [2, 2, 0, 1.5, 1.5, 1]], np.float32
        )
        for b in boxes:
            blob = b[:3] + rng.uniform(-0.3, 0.3, size=(50, 3))
            pts = np.concatenate(
                [pts, np.concatenate([blob, np.zeros((50, 3))], 1).astype(np.float32)]
            )
        name = f"scene{s:04d}"
        pts.tofile(str(tmp_path / f"{name}.bin"))
        infos.append(
            dict(
                point_cloud=dict(num_features=6, lidar_idx=name),
                pts_path=f"{name}.bin",
                annos=dict(
                    gt_num=2,
                    gt_boxes_upright_depth=boxes,
                    **{"class": np.array([0, 1])},
                ),
            )
        )
    info_path = tmp_path / "scannet_infos_train.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)
    db_path = create_gt_database(
        info_path, tmp_path, tmp_path, classes, db_prefix="scannet"
    )
    return tmp_path, db_path, classes


def test_create_gt_database(gt_db):
    tmp_path, db_path, classes = gt_db
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert set(db) == {"chair", "table"}
    assert len(db["chair"]) == 2  # one per scene
    info = db["chair"][0]
    assert info["num_points_in_gt"] > 0
    obj = np.fromfile(
        str(tmp_path / info["path"]), np.float32
    ).reshape(-1, 3)
    # stored relative to the bottom center -> all xy within half-dims
    assert np.all(np.abs(obj[:, :2]) <= info["box3d_lidar"][3:5] / 2 + 1e-5)


def test_sample_all_fills_deficit_and_avoids_collisions(gt_db):
    tmp_path, db_path, classes = gt_db
    sampler = DataBaseSampler(
        db_path, tmp_path, rate=1.0,
        prepare={"filter_by_min_points": {"chair": 1}},
        sample_groups={"chair": 4, "table": 4},
        classes=classes, point_dims=3,
        rng=np.random.default_rng(0),
    )
    # existing scene: one chair at the db chair location -> deficit 3,
    # but the db only has 2 chairs (and they collide with the existing box)
    gt = np.array([[-2, -2, -0.5, 1, 1, 1, 0]], np.float32)
    ret = sampler.sample_all(gt, np.array([0]))
    assert ret is not None
    boxes = ret["gt_bboxes_3d"]
    # no pasted box collides with the existing one or with each other
    all_boxes = np.concatenate([gt, boxes])
    corners = center_to_corner_box2d(
        all_boxes[:, :2], all_boxes[:, 3:5], all_boxes[:, 6]
    )
    coll = box_collision_test(corners, corners)
    np.fill_diagonal(coll, False)
    assert not coll.any()
    # pasted points land inside their boxes
    m = points_in_rbbox(ret["points"][:, :3], boxes)
    assert m.any(axis=0).all()
    assert len(ret["gt_labels_3d"]) == len(boxes)
    assert (ret["group_ids"] == np.arange(1, 1 + len(boxes))).all()


def test_sample_all_none_when_saturated(gt_db):
    tmp_path, db_path, classes = gt_db
    sampler = DataBaseSampler(
        db_path, tmp_path, rate=1.0, prepare={},
        sample_groups={"chair": 1}, classes=classes, point_dims=3,
        rng=np.random.default_rng(0),
    )
    gt = np.array([[0, 0, 0, 1, 1, 1, 0]], np.float32)
    assert sampler.sample_all(gt, np.array([0])) is None  # deficit 0


def test_object_sample_merges(gt_db):
    tmp_path, db_path, classes = gt_db
    sampler = DataBaseSampler(
        db_path, tmp_path, rate=1.0, prepare={},
        sample_groups={"chair": 2, "table": 2}, classes=classes,
        point_dims=3, rng=np.random.default_rng(0),
    )
    rng = np.random.default_rng(2)
    points = rng.uniform(-4, 4, size=(500, 4)).astype(np.float32)
    boxes = np.zeros((0, 7), np.float32)
    labels = np.zeros((0,), np.int64)
    new_pts, new_boxes, new_labels = object_sample(
        points, boxes, labels, sampler
    )
    assert len(new_boxes) > 0 and len(new_labels) == len(new_boxes)
    assert new_pts.shape[1] == 4  # feature width preserved (padded)
    # original points inside pasted boxes were removed
    n_pasted = len(new_pts) - np.sum(
        ~points_in_rbbox(points[:, :3], new_boxes).any(-1)
    )
    assert n_pasted > 0
    kept_original = new_pts[n_pasted:]
    assert not points_in_rbbox(kept_original[:, :3], new_boxes).any()
