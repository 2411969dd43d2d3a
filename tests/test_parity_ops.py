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

    feats = jnp.asarray(rng.normal(size=(2, 8, 4, 7)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(2, 8, 4, 3)).astype(np.float32))
    m = PAConv(in_channels=7, out_channels=16, num_kernels=4)
    variables = m.init(jax.random.PRNGKey(0), feats, xyz)
    out = m.apply(variables, feats, xyz)
    assert out.shape == (2, 8, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # trailing ReLU, as in the reference


def test_paconv_sa_module(rng):
    """PAConvSAModule (reference paconv_sa_module.py): sample + group +
    chained PAConvs + pool, gradient-connected end to end."""
    import jax

    from nesie_tpu.nn.pointnet2 import PAConvSAModule

    xyz = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 64, 6)).astype(np.float32))
    m = PAConvSAModule(num_point=16, radius=0.8, num_sample=8,
                       mlp_channels=(6, 16, 24), paconv_num_kernels=(4, 4))
    variables = m.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, out, idx = m.apply(variables, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 24)
    assert idx.shape == (2, 16)

    def loss(p):
        _, o, _ = m.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            xyz, feats, train=True, mutable=["batch_stats"])[0]
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(variables["params"])
    total = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda x: float(jnp.abs(x).sum()), g))
    assert total > 0 and np.isfinite(total)


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


# ---------------------------------------------------------------------------
# RoIAwarePool3d (reference roiaware_pool3d.py:9-44 + kernel.cu)
# ---------------------------------------------------------------------------


def _np_roiaware_pool3d(rois, pts, feats, out_size, max_pts, mode):
    """Literal numpy port of the CUDA kernel's semantics."""
    nx, ny, nz = out_size
    N, C = rois.shape[0], feats.shape[1]
    out = np.zeros((N, nx, ny, nz, C), np.float32)
    for b in range(N):
        cx, cy, cz, w, l, h, rz = rois[b]
        slots = {}
        for k in range(pts.shape[0]):
            x, y, z = pts[k]
            if abs(z - (cz + h / 2)) > h / 2:
                continue
            rot = rz + np.pi / 2
            lx = (x - cx) * np.cos(rot) - (y - cy) * np.sin(rot)
            ly = (x - cx) * np.sin(rot) + (y - cy) * np.cos(rot)
            if not (-l / 2 < lx < l / 2 and -w / 2 < ly < w / 2):
                continue
            xi = min(max(int((lx + l / 2) / (l / nx)), 0), nx - 1)
            yi = min(max(int((ly + w / 2) / (w / ny)), 0), ny - 1)
            zi = min(max(int((z - cz) / (h / nz)), 0), nz - 1)
            lst = slots.setdefault((xi, yi, zi), [])
            if len(lst) < max_pts - 1:  # slot 0 of the CUDA list is a counter
                lst.append(k)
        for (xi, yi, zi), lst in slots.items():
            f = feats[lst]
            out[b, xi, yi, zi] = f.max(0) if mode == "max" else f.mean(0)
    return out


def test_roiaware_pool3d_matches_numpy_oracle(rng):
    from nesie_tpu.ops import roiaware_pool3d

    N, P, C = 5, 300, 6
    rois = np.stack(
        [
            rng.uniform(-1, 1, N),
            rng.uniform(-1, 1, N),
            rng.uniform(-0.5, 0.5, N),
            rng.uniform(0.5, 1.5, N),
            rng.uniform(0.5, 1.5, N),
            rng.uniform(0.5, 1.5, N),
            rng.uniform(-np.pi, np.pi, N),
        ],
        axis=1,
    ).astype(np.float32)
    pts = rng.uniform(-1.5, 1.5, (P, 3)).astype(np.float32)
    feats = rng.normal(size=(P, C)).astype(np.float32)

    for mode in ("max", "avg"):
        got = np.asarray(
            roiaware_pool3d(rois, pts, feats, (4, 4, 4), 8, mode)
        )
        want = _np_roiaware_pool3d(rois, pts, feats, (4, 4, 4), 8, mode)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roiaware_pool3d_gradient_flows(rng):
    from nesie_tpu.ops import roiaware_pool3d

    rois = np.array([[0, 0, 0, 2, 2, 2, 0.3]], np.float32)
    pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    feats = rng.normal(size=(50, 4)).astype(np.float32)

    for mode in ("max", "avg"):
        g = jax.grad(
            lambda f: jnp.sum(roiaware_pool3d(rois, pts, f, 2, 8, mode))
        )(jnp.asarray(feats))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


# ---------------------------------------------------------------------------
# Sparse inverse / transposed convolutions (reference conv.py:286-388)
# ---------------------------------------------------------------------------


def _np_upsample_conv(x_sp, weights, out_coords, out_valid, stride):
    """Numpy oracle of the inverse/transpose gather: fine site o reads
    coarse q for offset k iff o == q*stride + off_k + (stride-1)//2."""
    ks = round(len(weights) ** (1 / 3))
    offs = np.stack(
        np.meshgrid(*([np.arange(ks) - (ks - 1) // 2] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    D, H, W = x_sp.grid_shape
    table = {
        tuple(np.asarray(x_sp.coords)[i]): np.asarray(x_sp.features)[i]
        for i in range(len(np.asarray(x_sp.valid)))
        if np.asarray(x_sp.valid)[i]
    }
    c = (stride - 1) // 2
    Cout = weights.shape[-1]
    out = np.zeros((len(out_coords), Cout), np.float32)
    for v in range(len(out_coords)):
        if not out_valid[v]:
            continue
        o = out_coords[v]
        for k, off in enumerate(offs):
            t = o - off - c
            if np.any(t % stride != 0):
                continue
            q = t // stride
            if not (0 <= q[0] < D and 0 <= q[1] < H and 0 <= q[2] < W):
                continue
            f = table.get(tuple(q))
            if f is not None:
                out[v] += f @ weights[k]
    return out


def test_sparse_inverse_conv_restores_sites(rng):
    from nesie_tpu.ops.spconv import sparse_inverse_conv3d

    D = H = W = 6
    dense = np.zeros((D, H, W, 2), np.float32)
    for _ in range(7):
        dense[rng.integers(0, D), rng.integers(0, H), rng.integers(0, W)] = (
            rng.normal(size=2)
        )
    ref, _ = _sparse_from_dense(dense)
    w_down = rng.normal(size=(27, 2, 3)).astype(np.float32) * 0.1
    down = sparse_conv3d(ref, jnp.asarray(w_down), stride=2)

    w_up = rng.normal(size=(27, 3, 4)).astype(np.float32) * 0.1
    up = sparse_inverse_conv3d(down, jnp.asarray(w_up), ref, stride=2)

    # output sites == the pre-downsample active sites, on the fine grid
    assert up.grid_shape == ref.grid_shape
    np.testing.assert_array_equal(np.asarray(up.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(up.coords), np.asarray(ref.coords))

    want = _np_upsample_conv(
        down, w_up, np.asarray(ref.coords), np.asarray(ref.valid), 2
    )
    np.testing.assert_allclose(np.asarray(up.features), want, atol=1e-4)


def test_sparse_conv_transpose_matches_oracle(rng):
    from nesie_tpu.ops.spconv import sparse_conv_transpose3d

    D = H = W = 3
    dense = np.zeros((D, H, W, 2), np.float32)
    dense[0, 0, 0] = [1, -1]
    dense[2, 1, 0] = [0.5, 2]
    sp, _ = _sparse_from_dense(dense)
    w = rng.normal(size=(27, 2, 3)).astype(np.float32) * 0.1

    out = sparse_conv_transpose3d(sp, jnp.asarray(w), stride=2,
                                  max_out_voxels=64)
    assert out.grid_shape == (6, 6, 6)
    # every active output must be reachable from an input site
    oc = np.asarray(out.coords)[np.asarray(out.valid)]
    want = _np_upsample_conv(sp, w, np.asarray(out.coords),
                             np.asarray(out.valid), 2)
    np.testing.assert_allclose(np.asarray(out.features), want, atol=1e-4)
    # site set: exactly the stride-upsampled kernel footprints of the inputs
    expect = set()
    for q in [(0, 0, 0), (2, 1, 0)]:
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    o = (q[0] * 2 + dz, q[1] * 2 + dy, q[2] * 2 + dx)
                    if all(0 <= v < 6 for v in o):
                        expect.add(o)
    assert {tuple(r) for r in oc} == expect


# ---------------------------------------------------------------------------
# PCDet-convention IoU/NMS (reference pcdet_nms_utils.py + iou3d_nms_kernel.cu)
# ---------------------------------------------------------------------------


def _np_pcdet_overlap(a, b):
    """Literal numpy port of the kernel's box_overlap (center-format BEV
    rotated rectangle intersection via edge crossings + contained corners,
    angle-sorted shoelace)."""
    def corners(box):
        x, y, dx, dy, ang = box[0], box[1], box[3], box[4], box[6]
        pts = np.array([[-dx / 2, -dy / 2], [dx / 2, -dy / 2],
                        [dx / 2, dy / 2], [-dx / 2, dy / 2]])
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s], [s, c]])
        return pts @ rot.T + [x, y]

    def in_box(p, box):
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = (p[0] - box[0]) * c - (p[1] - box[1]) * s
        ly = (p[0] - box[0]) * s + (p[1] - box[1]) * c
        return abs(lx) < box[3] / 2 + 1e-5 and abs(ly) < box[4] / 2 + 1e-5

    def seg_inter(p0, p1, q0, q1):
        d1, d2 = p1 - p0, q1 - q0
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            return None
        t = ((q0[0] - p0[0]) * d2[1] - (q0[1] - p0[1]) * d2[0]) / denom
        u = ((q0[0] - p0[0]) * d1[1] - (q0[1] - p0[1]) * d1[0]) / denom
        if -1e-9 <= t <= 1 + 1e-9 and -1e-9 <= u <= 1 + 1e-9:
            return p0 + t * d1
        return None

    ca, cb = corners(a), corners(b)
    pts = []
    for i in range(4):
        for j in range(4):
            p = seg_inter(ca[i], ca[(i + 1) % 4], cb[j], cb[(j + 1) % 4])
            if p is not None:
                pts.append(p)
    for k in range(4):
        if in_box(ca[k], b):
            pts.append(ca[k])
        if in_box(cb[k], a):
            pts.append(cb[k])
    if len(pts) < 3:
        return 0.0
    pts = np.asarray(pts)
    center = pts.mean(0)
    ang = np.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    pts = pts[np.argsort(ang)]
    x, y = pts[:, 0], pts[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _rand_boxes7(rng, n):
    return np.stack(
        [
            rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
            rng.uniform(-0.5, 0.5, n),
            rng.uniform(0.6, 2.0, n), rng.uniform(0.6, 2.0, n),
            rng.uniform(0.6, 2.0, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=1,
    ).astype(np.float32)


def test_pcdet_iou_bev_matches_kernel_port(rng):
    from nesie_tpu.core.pcdet_nms import boxes_iou_bev

    a, b = _rand_boxes7(rng, 12), _rand_boxes7(rng, 9)
    got = np.asarray(boxes_iou_bev(a, b))
    for i in range(len(a)):
        for j in range(len(b)):
            inter = _np_pcdet_overlap(a[i], b[j])
            area = a[i, 3] * a[i, 4] + b[j, 3] * b[j, 4] - inter
            np.testing.assert_allclose(
                got[i, j], inter / max(area, 1e-8), atol=2e-3
            )


def test_pcdet_iou3d_height_convention(rng):
    from nesie_tpu.core.pcdet_nms import boxes_iou3d

    # identical BEV footprint, shifted center z: iou = h_overlap/(2h - ov)
    a = np.array([[0, 0, 0.0, 1, 1, 1, 0.3]], np.float32)
    b = np.array([[0, 0, 0.4, 1, 1, 1, 0.3]], np.float32)
    got = float(boxes_iou3d(a, b)[0, 0])
    np.testing.assert_allclose(got, 0.6 / (2 - 0.6), rtol=1e-5)


def test_pcdet_nms_matches_oracle(rng):
    from nesie_tpu.core.pcdet_nms import boxes_iou_bev, nms, nms_normal

    boxes = _rand_boxes7(rng, 24)
    scores = rng.uniform(size=24).astype(np.float32)
    got, _ = nms(boxes, scores, 0.3)

    # oracle greedy on the kernel-port IoU matrix
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(24, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in range(24):
            inter = _np_pcdet_overlap(boxes[i], boxes[j])
            union = boxes[i, 3] * boxes[i, 4] + boxes[j, 3] * boxes[j, 4] - inter
            if inter / max(union, 1e-8) > 0.3:
                suppressed[j] = True
    np.testing.assert_array_equal(got, keep)

    # pre_maxsize truncates the score-ordered candidate list
    got_pre, _ = nms(boxes, scores, 0.3, pre_maxsize=5)
    assert set(got_pre) <= set(order[:5])

    # normal NMS ignores heading: same result as zero-heading rotated NMS
    flat = boxes.copy()
    flat[:, 6] = 0.0
    got_norm, _ = nms_normal(boxes, scores, 0.3)
    got_flat, _ = nms(flat, scores, 0.3)
    np.testing.assert_array_equal(got_norm, got_flat)
