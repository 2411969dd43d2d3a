"""Point-op unit tests against O(N^2) NumPy oracles (SURVEY.md section 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    knn,
    square_distance,
    three_interpolate,
    three_nn,
)


def np_fps(xyz, m):
    """Oracle mirroring the reference CUDA schedule."""
    n = xyz.shape[0]
    dists = np.full(n, 1e10)
    idxs = np.zeros(m, np.int32)
    last = 0
    for i in range(1, m):
        d = np.sum((xyz - xyz[last]) ** 2, -1)
        dists = np.minimum(dists, d)
        last = int(np.argmax(dists))
        idxs[i] = last
    return idxs


def np_ball_query(xyz, centers, radius, k, min_radius=0.0):
    m = centers.shape[0]
    out = np.zeros((m, k), np.int32)
    for i in range(m):
        d2 = np.sum((xyz - centers[i]) ** 2, -1)
        ok = (d2 == 0) | ((d2 >= min_radius**2) & (d2 < radius**2))
        hits = np.flatnonzero(ok)[:k]
        if len(hits):
            out[i] = hits[0]
            out[i, : len(hits)] = hits
    return out


def test_square_distance(rng):
    a = rng.normal(size=(2, 5, 3)).astype(np.float32)
    b = rng.normal(size=(2, 7, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.sum((a[:, :, None] - b[:, None]) ** 2, -1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fps_matches_oracle(rng):
    xyz = rng.normal(size=(3, 64, 3)).astype(np.float32)
    got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
    for b in range(3):
        np.testing.assert_array_equal(got[b], np_fps(xyz[b], 16))


def test_fps_covers_far_points():
    # two well-separated clusters: FPS must pick from both
    xyz = np.concatenate(
        [np.random.RandomState(0).randn(1, 32, 3), 100 + np.random.RandomState(1).randn(1, 32, 3)],
        axis=1,
    ).astype(np.float32)
    idx = np.asarray(furthest_point_sample(jnp.asarray(xyz), 4))[0]
    assert (idx < 32).any() and (idx >= 32).any()


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(size=(2, 128, 3)).astype(np.float32)
    centers = xyz[:, ::8]  # centers drawn from the cloud -> d2==0 hits
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.2, 8))
    for b in range(2):
        want = np_ball_query(xyz[b], centers[b], 0.2, 8)
        np.testing.assert_array_equal(got[b], want)


def test_ball_query_no_neighbors():
    xyz = jnp.ones((1, 16, 3))
    centers = jnp.zeros((1, 4, 3))
    got = np.asarray(ball_query(xyz, centers, 0.1, 4))
    np.testing.assert_array_equal(got, 0)


def test_ball_query_duplicate_fill(rng):
    xyz = rng.uniform(size=(1, 64, 3)).astype(np.float32) * 10
    centers = xyz[:, :3]
    got = np.asarray(ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.05, 6))[0]
    # each center only matches itself -> all slots filled with own index
    np.testing.assert_array_equal(got, np.repeat([[0], [1], [2]], 6, axis=1))


def test_gather_group(rng):
    data = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = rng.integers(0, 10, size=(2, 5)).astype(np.int32)
    got = np.asarray(gather_points(jnp.asarray(data), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], data[b, idx[b]])

    gidx = rng.integers(0, 10, size=(2, 5, 3)).astype(np.int32)
    got = np.asarray(group_points(jnp.asarray(data), jnp.asarray(gidx)))
    for b in range(2):
        np.testing.assert_array_equal(got[b], data[b][gidx[b]])


def test_group_points_grad_is_scatter_add(rng):
    data = rng.normal(size=(1, 6, 2)).astype(np.float32)
    idx = np.array([[[0, 0, 3], [5, 5, 5]]], np.int32)

    def f(x):
        return jnp.sum(group_points(x, jnp.asarray(idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(data)))
    want = np.zeros_like(data)
    for m in range(2):
        for k in range(3):
            want[0, idx[0, m, k]] += 1
    np.testing.assert_allclose(g, want)


def test_three_nn_and_interpolate(rng):
    src = rng.normal(size=(2, 32, 3)).astype(np.float32)
    q = rng.normal(size=(2, 8, 3)).astype(np.float32)
    dist, idx = three_nn(jnp.asarray(q), jnp.asarray(src))
    dist, idx = np.asarray(dist), np.asarray(idx)
    for b in range(2):
        d2 = np.sum((q[b][:, None] - src[b][None]) ** 2, -1)
        want_idx = np.argsort(d2, -1)[:, :3]
        np.testing.assert_array_equal(np.sort(idx[b], -1), np.sort(want_idx, -1))
        np.testing.assert_allclose(
            np.sort(dist[b], -1),
            np.sort(np.sqrt(np.take_along_axis(d2, want_idx, -1)), -1),
            atol=1e-3,
        )
    # inverse-distance interpolation of a linear field reproduces it ~exactly
    feats = src.copy()  # C=3, feature = coordinates
    w = 1.0 / (dist + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    interp = np.asarray(
        three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w))
    )
    assert interp.shape == (2, 8, 3)


def test_knn(rng):
    src = rng.normal(size=(1, 32, 3)).astype(np.float32)
    q = rng.normal(size=(1, 4, 3)).astype(np.float32)
    idx = np.asarray(knn(5, jnp.asarray(src), jnp.asarray(q)))[0]
    d2 = np.sum((q[0][:, None] - src[0][None]) ** 2, -1)
    want = np.argsort(d2, -1)[:, :5]
    np.testing.assert_array_equal(idx, want)


def test_fps_with_valid_mask(rng):
    xyz = rng.normal(size=(1, 32, 3)).astype(np.float32)
    mask = np.ones((1, 32), bool)
    mask[0, 16:] = False
    idx = np.asarray(
        furthest_point_sample(jnp.asarray(xyz), 8, valid_mask=jnp.asarray(mask))
    )
    assert (idx < 16).all()


def test_fps_prefix_consistency(rng):
    """FPS of an FPS-ordered subset equals its first M indices — the
    property behind the backbone's fps_prefix_opt."""
    xyz = jnp.asarray(rng.normal(size=(2, 128, 3)).astype(np.float32))
    idx = furthest_point_sample(xyz, 32)
    from nesie_tpu.ops import gather_points

    subset = gather_points(xyz, idx)  # FPS-selection order
    idx2 = np.asarray(furthest_point_sample(subset, 16))
    np.testing.assert_array_equal(idx2, np.tile(np.arange(16), (2, 1)))


def test_points_sampler_modes(rng):
    from nesie_tpu.ops import points_sampler

    xyz = jnp.asarray(rng.normal(size=(1, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(1, 64, 8)).astype(np.float32))
    d = np.asarray(points_sampler(xyz, feats, 8, "D-FPS"))
    f = np.asarray(points_sampler(xyz, feats, 8, "F-FPS"))
    fs = np.asarray(points_sampler(xyz, feats, 8, "FS"))
    assert d.shape == (1, 8) and f.shape == (1, 8)
    assert fs.shape == (1, 16)
    np.testing.assert_array_equal(fs[0, 8:], d[0])  # FS = [F-FPS, D-FPS]
    assert not np.array_equal(d, f)  # feature distances change the pick
