"""Golden tests, wave 6: the reference's full GT-database sampler
(datasets/pipelines/dbsampler.py) — BatchSampler round-robin, per-class
deficit counts, greedy BEV collision rejection, point pasting — imported
from /root/reference and matched against nesie_tpu/data/dbsampler.py on
an on-disk database.

Shuffles are made deterministic on both sides (identity permutation) so
the sampled candidate streams coincide; everything downstream (counts,
rejection, ordering, translation) is then compared exactly.
"""
from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/helpers")
import refshim  # noqa: E402
from refshim import load_ref  # noqa: E402


class _Pts:
    """Minimal stand-in for the reference's points object as used by
    sample_all (dbsampler.py:252-276): translate + cat."""

    def __init__(self, arr):
        self.arr = np.asarray(arr, np.float32)

    def translate(self, xyz):
        self.arr = self.arr.copy()
        self.arr[:, :3] += np.asarray(xyz, np.float32)

    def cat(self, lst):
        return _Pts(np.concatenate([p.arr for p in lst], axis=0))


@pytest.fixture(scope="module")
def ref_dbsampler():
    refshim.install_shims()
    if not hasattr(np, "long"):  # removed in numpy 2; dbsampler.py:265
        np.long = np.int64
    box_np_ops = load_ref("mmdet3d/core/bbox/box_np_ops.py",
                          "ref_box_np_ops")
    for name in ("mmdet3d", "mmdet3d.core", "mmdet3d.datasets"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    if "mmdet3d.core.bbox" not in sys.modules:
        sys.modules["mmdet3d.core.bbox"] = types.ModuleType(
            "mmdet3d.core.bbox")
    sys.modules["mmdet3d.core.bbox"].box_np_ops = box_np_ops
    # data_augment_utils itself imports mmdet3d.core.bbox.box_np_ops,
    # so it must load after the registration above
    dau = load_ref("mmdet3d/datasets/pipelines/data_augment_utils.py",
                   "ref_data_augment_utils")
    if "mmdet3d.datasets.pipelines" not in sys.modules:
        sys.modules["mmdet3d.datasets.pipelines"] = types.ModuleType(
            "mmdet3d.datasets.pipelines")
    sys.modules["mmdet3d.datasets.pipelines"].data_augment_utils = dau

    class _Logger:
        def info(self, *a, **k):
            pass

    utils_pkg = types.ModuleType("mmdet3d.utils")
    utils_pkg.get_root_logger = lambda *a, **k: _Logger()
    sys.modules["mmdet3d.utils"] = utils_pkg

    def _bin_loader(cfg):
        load_dim = cfg.get("load_dim", 4)
        use_dim = cfg.get("use_dim", list(range(load_dim)))

        def run(results):
            arr = np.fromfile(results["pts_filename"], np.float32)
            arr = arr.reshape(-1, load_dim)[:, use_dim]
            return dict(points=_Pts(arr))

        return run

    mmcv = sys.modules["mmcv"]
    mmcv.load = lambda path: pickle.load(open(path, "rb"))
    mmcv.build_from_cfg = lambda cfg, registry: _bin_loader(cfg)
    mmdet_ds = types.ModuleType("mmdet.datasets")
    mmdet_ds.PIPELINES = refshim._Registry()
    sys.modules["mmdet.datasets"] = mmdet_ds

    builder = types.ModuleType("refds.builder")
    builder.OBJECTSAMPLERS = refshim._Registry()
    sys.modules["refds.builder"] = builder
    return load_ref("mmdet3d/datasets/pipelines/dbsampler.py",
                    "refds.pipelines.dbsampler")


def _make_db(tmp_path, rng):
    """On-disk GT database: 3 classes, some infos filtered by min-points /
    difficulty, candidate boxes partially colliding with each other and
    with the scene GT."""
    classes = ["chair", "table", "sofa"]
    db = {c: [] for c in classes}
    counts = {"chair": 7, "table": 5, "sofa": 4}
    for ci, cls in enumerate(classes):
        for k in range(counts[cls]):
            # cluster candidates so several pairs collide in BEV
            box = np.array([
                rng.uniform(-4, 4) if k % 2 == 0 else rng.uniform(-1, 1),
                rng.uniform(-4, 4) if k % 2 == 0 else rng.uniform(-1, 1),
                rng.uniform(-0.2, 0.2),
                rng.uniform(0.6, 1.6), rng.uniform(0.6, 1.6),
                rng.uniform(0.5, 1.2), rng.uniform(-np.pi, np.pi),
            ], np.float32)
            npts = int(rng.integers(2, 8))
            pts = rng.normal(scale=0.3, size=(npts, 4)).astype(np.float32)
            rel = f"{cls}_{k}.bin"
            pts.tofile(tmp_path / rel)
            db[cls].append(dict(
                name=cls, path=rel, box3d_lidar=box,
                num_points_in_gt=npts,
                difficulty=int(rng.integers(0, 3))))
    info_path = tmp_path / "dbinfos.pkl"
    with open(info_path, "wb") as f:
        pickle.dump(db, f)
    return classes, info_path


@pytest.mark.parametrize("rate", [1.0, 0.5])
def test_dbsampler_sample_all_matches_reference(ref_dbsampler, tmp_path,
                                                monkeypatch, rate):
    rng = np.random.default_rng(7)
    classes, info_path = _make_db(tmp_path, rng)
    prepare = {"filter_by_min_points": {"chair": 4},
               "filter_by_difficulty": [2]}
    sample_groups = {"chair": 5, "table": 4, "sofa": 3}

    # deterministic candidate order on both sides
    monkeypatch.setattr(np.random, "shuffle", lambda x: None)

    ref = ref_dbsampler.DataBaseSampler(
        str(info_path), str(tmp_path), rate, prepare, sample_groups,
        classes=classes,
        points_loader=dict(type="LoadPointsFromFile", load_dim=4,
                           use_dim=[0, 1, 2, 3]))

    class _NoShuffle:
        def shuffle(self, x):
            pass

    from nesie_tpu.data.dbsampler import DataBaseSampler
    mine = DataBaseSampler(info_path, tmp_path, rate, dict(prepare),
                           dict(sample_groups), classes,
                           rng=_NoShuffle())

    # same filtered pools
    for cls in classes:
        assert len(mine.db_infos[cls]) == len(ref.db_infos[cls])

    gt_boxes = np.array([
        [0.0, 0.0, 0.0, 1.2, 1.2, 1.0, 0.2],
        [2.5, -2.5, 0.0, 1.0, 1.4, 1.0, -0.7],
    ], np.float32)
    gt_labels = np.array([0, 1], np.int64)

    # several rounds so the BatchSampler pools wrap and reset
    for round_i in range(3):
        want = ref.sample_all(gt_boxes.copy(), gt_labels.copy())
        got = mine.sample_all(gt_boxes, gt_labels)
        if want is None:
            assert got is None
            continue
        assert got is not None, f"round {round_i}"
        np.testing.assert_array_equal(
            got["gt_labels_3d"], want["gt_labels_3d"], err_msg=f"r{round_i}")
        np.testing.assert_allclose(
            got["gt_bboxes_3d"], want["gt_bboxes_3d"], rtol=1e-6,
            err_msg=f"r{round_i}")
        np.testing.assert_allclose(
            got["points"], want["points"].arr, rtol=1e-6, atol=1e-6,
            err_msg=f"r{round_i}")
        np.testing.assert_array_equal(got["group_ids"], want["group_ids"])


def test_batch_sampler_wrap_semantics_match_reference(ref_dbsampler,
                                                      monkeypatch):
    """The >= wrap quirk (dbsampler.py:50): a request that exactly reaches
    the end still returns only the remainder and resets."""
    monkeypatch.setattr(np.random, "shuffle", lambda x: None)
    items = [dict(i=i) for i in range(5)]
    ref_bs = ref_dbsampler.BatchSampler(items, name="x", shuffle=True)

    class _NoShuffle:
        def shuffle(self, x):
            pass

    from nesie_tpu.data.dbsampler import BatchSampler
    my_bs = BatchSampler(items, rng=_NoShuffle())
    for num in (2, 2, 2, 3, 5, 1, 4, 5, 5):
        want = [d["i"] for d in ref_bs.sample(num)]
        got = [d["i"] for d in my_bs.sample(num)]
        assert got == want, (num, got, want)
