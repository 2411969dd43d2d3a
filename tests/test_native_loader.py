"""Native C++ loader vs Python pipeline equivalence."""
import numpy as np
import pytest

from nesie_tpu.data import io
from nesie_tpu.data.native_loader import load_scene_native, native_available


@pytest.mark.skipif(not native_available(), reason="native lib not buildable")
def test_native_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    n = 500
    pts = rng.normal(size=(n, 6)).astype(np.float32)
    path = tmp_path / "scene.bin"
    pts.tofile(path)
    aam = np.eye(4, dtype=np.float32)
    aam[:3, 3] = [1.0, -2.0, 0.5]

    native = load_scene_native(path, aam, n, seed=7)
    assert native.shape == (n, 4)

    py = io.add_height(io.global_alignment(pts[:, :3], aam))
    # same multiset of rows (sampling without replacement over all rows)
    np.testing.assert_allclose(
        np.sort(native, axis=0), np.sort(py.astype(np.float32), axis=0),
        atol=1e-5,
    )


@pytest.mark.skipif(not native_available(), reason="native lib not buildable")
def test_native_sampling_subset(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 6)).astype(np.float32)
    path = tmp_path / "scene.bin"
    pts.tofile(path)
    out = load_scene_native(path, None, 100, seed=3)
    assert out.shape == (100, 4)
    # every sampled xyz row exists in the source
    src = pts[:, :3]
    for row in out[:10, :3]:
        assert np.min(np.sum((src - row) ** 2, axis=1)) < 1e-10
    # deterministic for a fixed seed
    out2 = load_scene_native(path, None, 100, seed=3)
    np.testing.assert_array_equal(out, out2)
    # different for different seeds
    out3 = load_scene_native(path, None, 100, seed=4)
    assert not np.array_equal(out, out3)
