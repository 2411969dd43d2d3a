"""Oracle for tools/dump_eval_set.py (VERDICT round-3 item 8): the dumped
pre-sampled eval clouds must equal what the reference's own
``IndoorPointSample`` (transforms_3d.py:819-861) produces for the same
seed and scene order — the legacy global-``np.random`` choice sequence.
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests/helpers")
sys.path.insert(0, "/root/repo/tools")
import refshim  # noqa: E402
from refshim import load_ref  # noqa: E402


@pytest.fixture(scope="module")
def ref_indoor_point_sample():
    refshim.install_shims()
    # transforms_3d.py pulls half the reference package at import; stub the
    # pieces it names — none participate in IndoorPointSample
    for name, attrs in [
        ("refp", {}),
        ("refp.datasets", {}),
        ("refp.datasets.builder", {"OBJECTSAMPLERS": object()}),
        ("refp.datasets.pipelines", {}),
        ("refp.datasets.pipelines.data_augment_utils",
         {"noise_per_object_v3_": lambda *a, **k: None}),
    ]:
        m = types.ModuleType(name)
        m.__path__ = []
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
    import torch  # noqa: F401  (refshim needs torch importable first)

    if not hasattr(sys.modules["mmcv.utils"], "build_from_cfg"):
        sys.modules["mmcv.utils"].build_from_cfg = lambda cfg, reg: None
    core = sys.modules.get("mmdet3d.core")
    if core is None:
        core = types.ModuleType("mmdet3d.core")
        core.__path__ = []
        sys.modules["mmdet3d.core"] = core
    if not hasattr(core, "VoxelGenerator"):
        core.VoxelGenerator = object
    if "mmdet3d.core.bbox" not in sys.modules:
        bbox = types.ModuleType("mmdet3d.core.bbox")
        bbox.__path__ = []
        sys.modules["mmdet3d.core.bbox"] = bbox
    if not hasattr(sys.modules["mmdet3d.core.bbox"], "box_np_ops"):
        sys.modules["mmdet3d.core.bbox"].box_np_ops = types.ModuleType(
            "mmdet3d.core.bbox.box_np_ops")
    if "mmdet.datasets.builder" not in sys.modules:
        b = types.ModuleType("mmdet.datasets.builder")
        sys.modules["mmdet.datasets.builder"] = b
    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls

            return deco

    sys.modules["mmdet.datasets.builder"].PIPELINES = _Reg()
    if "mmdet.datasets.pipelines" not in sys.modules:
        p = types.ModuleType("mmdet.datasets.pipelines")
        sys.modules["mmdet.datasets.pipelines"] = p
    if not hasattr(sys.modules["mmdet.datasets.pipelines"], "RandomFlip"):
        sys.modules["mmdet.datasets.pipelines"].RandomFlip = object
    mod = load_ref("mmdet3d/datasets/pipelines/transforms_3d.py",
                   "refp.datasets.pipelines.transforms_3d")
    return mod.IndoorPointSample


@pytest.mark.parametrize("seed,num_points", [(0, 512), (7, 2048)])
def test_dump_matches_reference_sampler(tmp_path, ref_indoor_point_sample,
                                        seed, num_points):
    from dump_eval_set import dump_eval_set

    from nesie_tpu.data import io
    from nesie_tpu.data.dataset import PresampledScanNetScenes, ScanNetScenes
    from nesie_tpu.data.synthetic import write_synthetic_scannet

    root = tmp_path / "data"
    write_synthetic_scannet(root, n_train=2, n_val=5, seed=3)
    ann = root / "scannet_infos_val.pkl"

    out = dump_eval_set(root, ann, tmp_path / "presampled", num_points, seed)

    # reference side: same raw clouds (aligned + height), same scene order,
    # the reference's own transform consuming the global np.random stream
    ds = ScanNetScenes(root, ann)
    tr = ref_indoor_point_sample(num_points)
    np.random.seed(seed)
    ref_clouds = []
    for scene in ds.scenes:
        pts = io.load_points_bin(scene.pts_path)
        pts = io.global_alignment(pts, scene.axis_align)
        pts = io.add_height(pts).astype(np.float32)
        res = tr({"points": pts})
        ref_clouds.append(res["points"])

    pre = PresampledScanNetScenes(out)
    assert pre.num_points == num_points
    assert len(pre) == len(ds)
    for scene, ref_pts in zip(pre.scenes, ref_clouds):
        np.testing.assert_array_equal(scene.points, ref_pts)

    # the dump rides the normal eval_batch path with static shapes
    batch = pre.eval_batch([0, 1], np.random.default_rng(0), num_points)
    assert batch["points"].shape == (2, num_points, 4)
    np.testing.assert_array_equal(batch["points"][0], pre.scenes[0].points)
