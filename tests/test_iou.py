"""Rotated / axis-aligned IoU tests, including a shapely-free oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.core import axis_aligned_iou_3d, giou3d, iou3d, iou_bev


def test_identical_boxes():
    b = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 3.0, 4.0, 0.4]])
    np.testing.assert_allclose(np.asarray(iou3d(b, b)), [1.0], atol=1e-5)


def test_disjoint_boxes():
    a = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[10.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.7]])
    np.testing.assert_allclose(np.asarray(iou3d(a, b)), [0.0], atol=1e-6)


def test_axis_aligned_case_matches_simple_formula():
    a = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.asarray([[1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    inter = 1.0
    union = 8 + 8 - inter
    np.testing.assert_allclose(np.asarray(iou3d(a, b)), [inter / union], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(axis_aligned_iou_3d(a, b, aligned=True)), [inter / union], atol=1e-5
    )


def test_rotated_45_overlap():
    # unit square vs the same square rotated 45 deg: octagon intersection
    # area = 2*(sqrt(2)-1), union = 2 - that.
    a = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, np.pi / 4]])
    inter = 2 * (np.sqrt(2) - 1)
    want = inter / (2 - inter)
    np.testing.assert_allclose(np.asarray(iou3d(a, b)), [want], atol=1e-4)


def test_z_offset_reduces_iou():
    a = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.2]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.2]])
    np.testing.assert_allclose(np.asarray(iou3d(a, b)), [1 / 3], atol=1e-4)


def test_iou_gradient_finite():
    a = jnp.asarray([0.1, 0.0, 0.0, 1.2, 1.0, 1.0, 0.2])
    b = jnp.asarray([0.0, 0.1, 0.0, 1.0, 1.1, 1.0, -0.1])
    g = jax.grad(lambda x: iou3d(x[None], b[None])[0])(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_iou_gradient_zero_overlap_is_finite():
    a = jnp.asarray([5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 0.3])
    b = jnp.asarray([0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0])
    g = jax.grad(lambda x: iou3d(x[None], b[None])[0])(a)
    assert np.isfinite(np.asarray(g)).all()


def test_iou_bev_batch_shapes(rng):
    a = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 7, 5)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0.5, 2.0, size=(4, 7, 5)).astype(np.float32))
    iou, _ = iou_bev(a, b)
    assert iou.shape == (4, 7)
    assert np.isfinite(np.asarray(iou)).all()


def test_giou_identical_is_zero_loss():
    b = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, 0.5]])
    loss, iou = giou3d(b, b)
    np.testing.assert_allclose(np.asarray(iou), [1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(loss), [0.0], atol=1e-4)


def test_random_rotated_iou_against_monte_carlo(rng):
    # Monte-Carlo BEV oracle
    for _ in range(3):
        p = rng.uniform(0.8, 1.5, size=2)
        boxes = np.array(
            [
                [0, 0, 0, p[0], p[1], 1, rng.uniform(-np.pi, np.pi)],
                [rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3), 0,
                 p[1], p[0], 1, rng.uniform(-np.pi, np.pi)],
            ],
            np.float32,
        )
        got = float(iou3d(jnp.asarray(boxes[0:1]), jnp.asarray(boxes[1:2]))[0])
        # sample points in the plane
        pts = rng.uniform(-2, 2, size=(200000, 2)).astype(np.float32)

        def inside(b):
            # bev_corners rotates counterclockwise by alpha, so the
            # world->box transform is R(-alpha)
            d = pts - b[:2]
            c, s = np.cos(b[6]), np.sin(b[6])
            lx = c * d[:, 0] + s * d[:, 1]
            ly = -s * d[:, 0] + c * d[:, 1]
            return (np.abs(lx) < b[3] / 2) & (np.abs(ly) < b[4] / 2)

        m0, m1 = inside(boxes[0]), inside(boxes[1])
        inter = (m0 & m1).mean() * 16
        union = (m0 | m1).mean() * 16
        want = inter / max(union, 1e-9)
        assert abs(got - want) < 0.02, (got, want)
