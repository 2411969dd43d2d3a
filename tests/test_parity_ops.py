"""Tests for capability-parity ops: voxelization, sparse conv, paconv,
multiclass NMS, TTA merge."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.ops.voxel import dynamic_scatter, voxelize
from nesie_tpu.ops.spconv import (
    SparseTensor,
    sparse_conv3d,
    sparse_maxpool3d,
    submanifold_conv3d,
)


def test_voxelize_basic():
    pts = np.array(
        [[0.05, 0.05, 0.05, 1.0],
         [0.06, 0.06, 0.06, 2.0],   # same voxel
         [0.95, 0.95, 0.95, 3.0],   # different voxel
         [9.0, 9.0, 9.0, 4.0]],     # out of range
        np.float32,
    )
    res = voxelize(jnp.asarray(pts), (0.1, 0.1, 0.1), (0, 0, 0, 1, 1, 1),
                   max_points=2, max_voxels=4)
    assert int(res.num_voxels) == 2
    np_sorted = np.sort(np.asarray(res.num_points)[np.asarray(res.valid)])
    np.testing.assert_array_equal(np_sorted, [1, 2])
    # voxel containing two points holds both
    v = np.asarray(res.voxels)
    nonzero_rows = v[np.asarray(res.num_points) == 2]
    assert nonzero_rows.shape[0] == 1
    np.testing.assert_allclose(sorted(nonzero_rows[0][:, 3]), [1, 2])


def test_voxelize_max_points_cap():
    pts = np.zeros((10, 3), np.float32) + 0.05
    res = voxelize(jnp.asarray(pts), (0.1,) * 3, (0, 0, 0, 1, 1, 1),
                   max_points=3, max_voxels=4)
    assert int(res.num_voxels) == 1
    assert int(np.asarray(res.num_points).max()) == 3


def test_dynamic_scatter_mean_max():
    pts = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [10.0, 10.0]])
    ids = jnp.asarray([0, 0, 2])
    mean = np.asarray(dynamic_scatter(pts, ids, 3, "mean"))
    np.testing.assert_allclose(mean[0], [2, 3])
    np.testing.assert_allclose(mean[2], [10, 10])
    np.testing.assert_allclose(mean[1], [0, 0])
    mx = np.asarray(dynamic_scatter(pts, ids, 3, "max"))
    np.testing.assert_allclose(mx[0], [3, 4])


def _sparse_from_dense(dense):
    """dense (D, H, W, C) -> SparseTensor of its nonzero sites."""
    D, H, W, C = dense.shape
    mask = np.abs(dense).sum(-1) > 0
    zz, yy, xx = np.nonzero(mask)
    V = 32
    feats = np.zeros((V, C), np.float32)
    coords = np.zeros((V, 3), np.int32)
    valid = np.zeros(V, bool)
    n = len(zz)
    feats[:n] = dense[zz, yy, xx]
    coords[:n] = np.stack([zz, yy, xx], 1)
    valid[:n] = True
    return SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(valid), (D, H, W)), mask


def test_submanifold_conv_matches_dense_on_active_sites(rng):
    D = H = W = 5
    Cin, Cout = 2, 3
    dense = np.zeros((D, H, W, Cin), np.float32)
    for _ in range(6):
        dense[rng.integers(0, D), rng.integers(0, H), rng.integers(0, W)] = (
            rng.normal(size=Cin)
        )
    sp, mask = _sparse_from_dense(dense)
    weights = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1

    out = submanifold_conv3d(sp, jnp.asarray(weights))
    # dense oracle: full conv, evaluated at active sites, with *inactive*
    # neighbor contributions removed (submanifold semantics: inputs only
    # from active sites)
    got = np.asarray(out.features)
    offs = np.stack(np.meshgrid(*([np.arange(3) - 1] * 3), indexing="ij"), -1).reshape(-1, 3)
    for v in range(np.asarray(sp.valid).sum()):
        z, y, x = np.asarray(sp.coords)[v]
        acc = np.zeros(Cout)
        for k, (dz, dy, dx) in enumerate(offs):
            nz, ny, nx = z - dz, y - dy, x - dx
            if 0 <= nz < D and 0 <= ny < H and 0 <= nx < W and mask[nz, ny, nx]:
                acc += dense[nz, ny, nx] @ weights[k]
        np.testing.assert_allclose(got[v], acc, atol=1e-4)


def test_sparse_conv_downsamples(rng):
    D = H = W = 4
    dense = np.zeros((D, H, W, 2), np.float32)
    dense[0, 0, 0] = [1, 2]
    dense[1, 1, 1] = [3, 4]   # same output cell at stride 2
    dense[3, 3, 3] = [5, 6]
    sp, _ = _sparse_from_dense(dense)
    w = np.zeros((27, 2, 2), np.float32)
    out = sparse_conv3d(sp, jnp.asarray(w), stride=2)
    assert out.grid_shape == (2, 2, 2)
    assert int(np.asarray(out.valid).sum()) == 2  # (0,0,0) and (1,1,1)


def test_sparse_maxpool(rng):
    D = H = W = 4
    dense = np.zeros((D, H, W, 1), np.float32)
    dense[0, 0, 0] = 1.0
    dense[1, 1, 1] = 5.0
    dense[3, 3, 3] = 2.0
    sp, _ = _sparse_from_dense(dense)
    out = sparse_maxpool3d(sp, stride=2)
    vals = np.asarray(out.features)[np.asarray(out.valid)][:, 0]
    np.testing.assert_allclose(sorted(vals), [2.0, 5.0])


def test_paconv_shapes(rng):
    from nesie_tpu.ops.paconv import PAConv

    x = jnp.asarray(rng.normal(size=(2, 8, 4, 7)).astype(np.float32))
    m = PAConv(out_channels=16, num_matrices=4)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 8, 4, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_multiclass_nms(rng):
    from nesie_tpu.core.multiclass_nms import box3d_multiclass_nms

    boxes = jnp.asarray(
        np.array([[0, 0, 0, 1, 1, 1, 0.0], [0.05, 0, 0, 1, 1, 1, 0.0],
                  [5, 5, 5, 1, 1, 1, 0.3]], np.float32)
    )
    scores = jnp.asarray(
        np.array([[0.9, 0.0, 0.1], [0.8, 0.0, 0.2], [0.0, 0.7, 0.3]], np.float32)
    )  # 2 classes + bg
    b, s, l, v = box3d_multiclass_nms(boxes, scores, 0.1, 0.25, max_num=5)
    v = np.asarray(v)
    assert v.sum() == 2  # overlapping pair suppressed to 1 + 1 far box
    kept_labels = np.asarray(l)[v]
    assert set(kept_labels.tolist()) == {0, 1}


def test_tta_merge_roundtrip(rng):
    from nesie_tpu.eval.tta import apply_view_np, make_tta_views, mapping_back_np, merge_aug_bboxes_3d

    views = make_tta_views(flip=True, scales=(1.0,))
    assert len(views) == 4
    box = np.array([[0.5, -0.3, 0.2, 1.0, 2.0, 1.0, 0.4]], np.float32)
    results = []
    for hf, vf, sc in views:
        # pretend the detector found the same physical box in each view:
        # forward-transform it into the view frame
        b = box.copy()
        if hf:
            b[:, 0] = -b[:, 0]
            b[:, 6] = np.pi - b[:, 6]
        if vf:
            b[:, 1] = -b[:, 1]
            b[:, 6] = -b[:, 6]
        b[:, :6] *= sc
        results.append(dict(boxes=b, scores=np.array([0.9]), labels=np.array([2])))
    merged = merge_aug_bboxes_3d(results, views, nms_thr=0.25)
    # all four views agree -> NMS keeps one box at the original pose
    assert len(merged["boxes"]) == 1
    np.testing.assert_allclose(merged["boxes"][0][:6], box[0][:6], atol=1e-5)
    assert merged["labels"][0] == 2


def test_sparse_basic_block(rng):
    from nesie_tpu.nn.sparse_block import SparseBasicBlock

    dense = np.zeros((4, 4, 4, 8), np.float32)
    dense[0, 0, 0] = rng.normal(size=8)
    dense[2, 1, 3] = rng.normal(size=8)
    sp, _ = _sparse_from_dense(dense)
    block = SparseBasicBlock(channels=8)
    variables = block.init(jax.random.PRNGKey(0), sp, False)
    out, _ = block.apply(variables, sp, True, mutable=["batch_stats"])
    assert out.features.shape == (32, 8)
    assert np.isfinite(np.asarray(out.features)).all()
    # inactive sites stay zero
    inactive = ~np.asarray(sp.valid)
    assert np.abs(np.asarray(out.features)[inactive]).sum() == 0


def test_circle_nms():
    from nesie_tpu.core.multiclass_nms import circle_nms

    dets = jnp.asarray(
        np.array([[0, 0, 0.9], [0.1, 0, 0.8], [5, 5, 0.7]], np.float32)
    )
    keep = np.asarray(circle_nms(dets, thresh=1.0))
    np.testing.assert_array_equal(keep, [True, False, True])
