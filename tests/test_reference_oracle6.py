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
import torch

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


@pytest.fixture(scope="module")
def ref_paconv():
    refshim.install_shims()
    utils = load_ref("mmdet3d/ops/paconv/utils.py", "refpaconv.utils")
    assign_stub = types.ModuleType("refpaconv.assign_score")
    assign_stub.assign_score_withk = None  # only PAConvCUDA touches it
    sys.modules["refpaconv.assign_score"] = assign_stub
    return load_ref("mmdet3d/ops/paconv/paconv.py", "refpaconv.paconv",
                    package_modules={"utils": utils,
                                     "assign_score": assign_stub})


@pytest.mark.parametrize("scorenet_input,kernel_input",
                         [("w_neighbor_dist", "w_neighbor"),
                          ("identity", "identity"),
                          ("w_neighbor", "w_neighbor")])
def test_paconv_forward_matches_reference(ref_paconv, scorenet_input,
                                          kernel_input):
    """Full PAConv forward (paconv.py:106-298) — ScoreNet MLPs, kernel
    input assembly, weight-bank mixing, BN+ReLU — reference torch module
    in eval mode vs the flax port with copied weights."""
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    B, npoint, K, in_c, out_c, M = 2, 6, 5, 8, 12, 4

    ref = ref_paconv.PAConv(in_c, out_c, M, scorenet_input=scorenet_input,
                            kernel_input=kernel_input)
    ref.eval()
    # non-trivial BN stats so the normalization itself is exercised
    with torch.no_grad():
        ref.bn.running_mean.uniform_(-0.5, 0.5)
        ref.bn.running_var.uniform_(0.5, 2.0)

    feats = rng.normal(size=(B, in_c, npoint, K)).astype(np.float32)
    # K slot 0 is the grouping center (paconv.py:231,265)
    xyz = rng.normal(size=(B, 3, npoint, K)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref((torch.from_numpy(feats), torch.from_numpy(xyz)))
    want = want.numpy()  # (B, out_c, npoint, K)

    from nesie_tpu.ops.paconv import PAConv
    port = PAConv(in_channels=in_c, out_channels=out_c, num_kernels=M,
                  scorenet_input=scorenet_input, kernel_input=kernel_input)
    feats_l = jnp.asarray(np.moveaxis(feats, 1, -1))  # (B, npoint, K, in_c)
    xyz_l = jnp.asarray(np.moveaxis(xyz, 1, -1))
    variables = port.init(jax.random.PRNGKey(0), feats_l, xyz_l)

    import flax
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    for name in list(params["scorenet"]):
        i = int(name.split("_")[0][len("layer"):])
        if name.endswith("_conv"):
            w = sd[f"scorenet.mlps.layer{i}.conv.weight"][:, :, 0, 0]
            params["scorenet"][name]["kernel"] = w.T
            if "bias" in params["scorenet"][name]:
                params["scorenet"][name]["bias"] = (
                    sd[f"scorenet.mlps.layer{i}.conv.bias"])
        else:
            params["scorenet"][name]["scale"] = (
                sd[f"scorenet.mlps.layer{i}.bn.weight"])
            params["scorenet"][name]["bias"] = (
                sd[f"scorenet.mlps.layer{i}.bn.bias"])
            stats["scorenet"][name]["mean"] = (
                sd[f"scorenet.mlps.layer{i}.bn.running_mean"])
            stats["scorenet"][name]["var"] = (
                sd[f"scorenet.mlps.layer{i}.bn.running_var"])
    params["weight_bank"] = sd["weight_bank"]
    params["bn"]["scale"] = sd["bn.weight"]
    params["bn"]["bias"] = sd["bn.bias"]
    stats["bn"]["mean"] = sd["bn.running_mean"]
    stats["bn"]["var"] = sd["bn.running_var"]

    got = port.apply({"params": params, "batch_stats": stats},
                     feats_l, xyz_l)  # (B, npoint, K, out_c)
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _write_scene(tmp_path, rng):
    """Synthetic raw ScanNet scan: binary PLY + aggregation/segs json +
    meta with axisAlignment + nyu40 label-map TSV."""
    import json
    import struct

    scan = tmp_path / "scene0000_00"
    scan.mkdir()
    n = 300
    xyz = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    ply = scan / "scene0000_00_vh_clean_2.ply"
    with open(ply, "wb") as f:
        f.write((
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n").encode())
        for i in range(n):
            f.write(struct.pack("<fffBBB", *xyz[i], *rgb[i]))

    # 30 segments of 10 verts; 6 objects of 3-4 segments each
    seg_ids = np.repeat(np.arange(30), 10)
    (scan / "scene0000_00_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_ids.tolist()}))
    labels = ["cabinet", "bed", "chair", "sofa", "table", "chair"]
    groups = []
    seg_pool = list(range(30))
    rng.shuffle(seg_pool)
    for oid, lab in enumerate(labels):
        k = 3 + (oid % 2)
        segs = [int(seg_pool.pop()) for _ in range(k)]
        groups.append({"objectId": oid, "label": lab, "segments": segs})
    (scan / "scene0000_00.aggregation.json").write_text(
        json.dumps({"segGroups": groups}))

    theta = 0.35
    aam = np.eye(4)
    aam[:2, :2] = [[np.cos(theta), -np.sin(theta)],
                   [np.sin(theta), np.cos(theta)]]
    aam[:3, 3] = [0.2, -0.4, 0.05]
    (scan / "scene0000_00.txt").write_text(
        "axisAlignment = " + " ".join(f"{v:.6f}" for v in aam.ravel())
        + "\ncolorHeight = 968\n")

    tsv = tmp_path / "scannetv2-labels.combined.tsv"
    rows = ["raw_category\tnyu40id", "cabinet\t3", "bed\t4", "chair\t5",
            "sofa\t6", "table\t7"]
    tsv.write_text("\n".join(rows) + "\n")
    return scan, tsv, aam


@pytest.fixture(scope="module")
def ref_scannet_export():
    """Load the reference's load_scannet_data.export with a minimal
    plyfile shim (the real package is not installed)."""
    import struct

    class _Vertex:
        def __init__(self, data):
            self.data = data
            self.count = len(data)

    class _PlyData:
        def __init__(self, vert):
            self._vert = vert

        def __getitem__(self, key):
            assert key == "vertex"
            return self._vert

        @staticmethod
        def read(f):
            # independent parser for the fixed test header above
            header = b""
            while not header.endswith(b"end_header\n"):
                header += f.read(1)
            n = int([ln for ln in header.decode().splitlines()
                     if ln.startswith("element vertex")][0].split()[-1])
            dt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                           ("red", "u1"), ("green", "u1"), ("blue", "u1")])
            data = np.frombuffer(f.read(n * dt.itemsize), dtype=dt)
            return _PlyData(_Vertex(data))

    plyfile = types.ModuleType("plyfile")
    plyfile.PlyData = _PlyData
    sys.modules.setdefault("plyfile", plyfile)
    utils = load_ref("data/scannet/scannet_utils.py", "ref_scannet_utils")
    sys.modules["scannet_utils"] = utils
    return load_ref("data/scannet/load_scannet_data.py",
                    "ref_load_scannet_data")


def test_scannet_export_matches_reference(ref_scannet_export, tmp_path):
    """Raw-scan extraction (load_scannet_data.py:73-166): vertex parsing,
    label/instance assignment through segs+aggregation, axis alignment,
    and aligned bbox extraction vs data/scannet_prep.export_scan, with the
    reference's batch_load OBJ_CLASS_IDS filter applied downstream."""
    rng = np.random.default_rng(5)
    scan, tsv, aam = _write_scene(tmp_path, rng)

    mesh, sem, ins, unaligned, aligned, obj2label, ref_aam = (
        ref_scannet_export.export(
            str(scan / "scene0000_00_vh_clean_2.ply"),
            str(scan / "scene0000_00.aggregation.json"),
            str(scan / "scene0000_00_vh_clean_2.0.010000.segs.json"),
            str(scan / "scene0000_00.txt"),
            str(tsv)))

    from nesie_tpu.data.scannet_prep import export_scan
    got = export_scan(scan, "scene0000_00", tsv, max_num_points=10_000)

    np.testing.assert_allclose(got["points"], mesh, rtol=1e-6)
    np.testing.assert_array_equal(got["semantic_ids"], sem.astype(np.int64))
    np.testing.assert_array_equal(got["instance_ids"], ins.astype(np.int64))
    np.testing.assert_allclose(got["axis_align_matrix"], ref_aam, rtol=1e-6)

    # the reference filters classes downstream (batch_load_scannet_data.py
    # OBJ_CLASS_IDS); export_scan filters at extraction with the same ids
    obj_ids = np.array([3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28,
                        33, 34, 36, 39])
    keep = np.isin(aligned[:, -1], obj_ids)
    np.testing.assert_allclose(got["boxes"], aligned[keep], rtol=1e-5,
                               atol=1e-5)


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
