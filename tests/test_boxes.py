"""Geometry-core tests: corners, points-in-boxes, surfaces."""
import numpy as np
import jax.numpy as jnp

from nesie_tpu.core import (
    box_corners,
    box_to_surface,
    corners_minmax,
    gravity_center_of,
    limit_period,
    points_in_boxes,
)


def test_axis_aligned_corners():
    box = jnp.asarray([[1.0, 2.0, 3.0, 2.0, 4.0, 6.0, 0.0]])
    c = np.asarray(box_corners(box))[0]
    np.testing.assert_allclose(c.min(0), [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c.max(0), [2.0, 4.0, 6.0], atol=1e-6)
    mm = np.asarray(corners_minmax(box_corners(box)))[0]
    np.testing.assert_allclose(mm, [0, 0, 0, 2, 4, 6], atol=1e-6)


def test_rotated_corners_quarter_turn():
    # yaw = pi/2 rotates clockwise in the depth convention:
    # the +x half-extent maps to -y.
    box = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 1.0, 1.0, np.pi / 2]])
    c = np.asarray(box_corners(box))[0]
    np.testing.assert_allclose(c[:, 0].max(), 0.5, atol=1e-6)
    np.testing.assert_allclose(c[:, 1].max(), 1.0, atol=1e-6)


def test_points_in_boxes_axis_aligned():
    boxes = jnp.asarray([[[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]]])  # bottom center
    pts = jnp.asarray(
        [[[0.0, 0.0, 1.0], [0.9, 0.9, 1.9], [1.1, 0.0, 1.0], [0.0, 0.0, 2.0],
          [0.0, 0.0, -0.1]]]
    )
    m = np.asarray(points_in_boxes(pts, boxes))[0, :, 0]
    # z faces inclusive, xy faces exclusive (reference CUDA semantics)
    np.testing.assert_array_equal(m, [True, True, False, True, False])


def test_points_in_boxes_rotated():
    # box 4 long in x, rotated 90deg: now long in y
    boxes = jnp.asarray([[[0.0, 0.0, 0.0, 4.0, 1.0, 2.0, np.pi / 2]]])
    pts = jnp.asarray([[[0.0, 1.5, 1.0], [1.5, 0.0, 1.0]]])
    m = np.asarray(points_in_boxes(pts, boxes))[0, :, 0]
    np.testing.assert_array_equal(m, [True, False])


def test_corners_points_in_boxes_consistency():
    # corners shrunk toward the center must be inside; expanded, outside.
    import jax.numpy as jnp

    box = jnp.asarray([[[0.3, -0.2, 0.1, 2.0, 1.0, 1.5, 0.7]]])  # bottom center
    grav = np.array([0.3, -0.2, 0.1 + 0.75])
    c = np.asarray(
        box_corners(jnp.asarray([[0.3, -0.2, 0.85, 2.0, 1.0, 1.5, 0.7]]))
    )[0]
    inner = grav + (c - grav) * 0.98
    outer = grav + (c - grav) * 1.02
    pts = jnp.asarray(np.concatenate([inner, outer])[None])
    m = np.asarray(points_in_boxes(pts, box))[:, :, 0][0]
    assert m[:8].all()
    assert not m[8:].any()


def test_gravity_center():
    b = jnp.asarray([[1.0, 2.0, 0.0, 1.0, 1.0, 4.0]])
    np.testing.assert_allclose(np.asarray(gravity_center_of(b))[0], [1, 2, 2])


def test_box_to_surface():
    b = jnp.asarray([[0.0, 0.0, 1.0, 2.0, 4.0, 2.0, 0.3]])
    s = np.asarray(box_to_surface(b))[0]
    np.testing.assert_allclose(s, [-1, -2, 0, 1, 2, 2], atol=1e-6)


def test_limit_period():
    v = jnp.asarray([3.5 * np.pi, -2.5 * np.pi])
    out = np.asarray(limit_period(v, 0.5, 2 * np.pi))
    assert (out >= -np.pi).all() and (out < np.pi).all()


def test_np_box_ops_consistent_with_jax():
    from nesie_tpu.core.np_box_ops import (
        center_to_corner_box3d, corner_to_standup_nd, points_in_rbbox,
    )
    from nesie_tpu.core import box_corners, corners_minmax, points_in_boxes
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    boxes = rng.uniform(0.5, 2.0, (4, 7)).astype(np.float32)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 4)
    # numpy corners (gravity-center origin) match jax corners
    c_np = center_to_corner_box3d(boxes[:, :3], boxes[:, 3:6], boxes[:, 6])
    c_jx = np.asarray(box_corners(jnp.asarray(boxes)))
    np.testing.assert_allclose(c_np, c_jx, atol=1e-5)
    np.testing.assert_allclose(
        corner_to_standup_nd(c_np),
        np.asarray(corners_minmax(box_corners(jnp.asarray(boxes)))),
        atol=1e-5,
    )
    pts = rng.uniform(-2, 4, (100, 3)).astype(np.float32)
    m_np = points_in_rbbox(pts, boxes, origin=(0.5, 0.5, 0.5))
    bb = boxes.copy()
    bb[:, 2] -= bb[:, 5] / 2  # to bottom for the jax op
    m_jx = np.asarray(points_in_boxes(jnp.asarray(pts[None]), jnp.asarray(bb[None])))[0]
    np.testing.assert_array_equal(m_np, m_jx)
