"""Augmentation invariants: box/point consistency + exact inverse."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.core.boxes import points_in_boxes
from nesie_tpu.data.augment import (
    AugParams,
    augment_boxes,
    augment_points,
    reproject_boxes,
    unaugment_boxes,
)


def _rand_aug(key, batch=()):
    return AugParams.sample(key, batch)


def test_inverse_roundtrip(rng):
    boxes = jnp.asarray(rng.uniform(-2, 2, (2, 5, 7)).astype(np.float32))
    boxes = boxes.at[..., 3:6].set(jnp.abs(boxes[..., 3:6]) + 0.5)
    aug = _rand_aug(jax.random.PRNGKey(3), (2,))
    back = unaugment_boxes(augment_boxes(boxes, aug), aug)
    got = np.asarray(back)
    want = np.asarray(boxes)
    np.testing.assert_allclose(got[..., :6], want[..., :6], atol=1e-5)
    # yaw equal mod 2pi
    dyaw = (got[..., 6] - want[..., 6] + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)


def test_points_in_boxes_invariant_under_aug(rng):
    pts = jnp.asarray(rng.uniform(-2, 2, (1, 200, 3)).astype(np.float32))
    boxes = jnp.asarray(
        np.array([[[0.2, -0.3, -0.5, 1.5, 1.0, 1.2, 0.6],
                   [-0.5, 0.5, -0.2, 1.0, 2.0, 0.8, -0.4]]], np.float32)
    )
    before = np.asarray(points_in_boxes(pts, boxes))
    for seed in range(4):
        aug = _rand_aug(jax.random.PRNGKey(seed), (1,))
        after = np.asarray(
            points_in_boxes(augment_points(pts, aug), augment_boxes(boxes, aug))
        )
        np.testing.assert_array_equal(after, before)


def test_reproject_identity_when_same_aug(rng):
    boxes = jnp.asarray(rng.uniform(-1, 1, (1, 3, 7)).astype(np.float32))
    boxes = boxes.at[..., 3:6].set(1.0)
    aug = _rand_aug(jax.random.PRNGKey(9), (1,))
    out = np.asarray(reproject_boxes(boxes, aug, aug))
    np.testing.assert_allclose(out[..., :6], np.asarray(boxes)[..., :6], atol=1e-5)


def test_height_feature_scales():
    pts = jnp.ones((1, 4, 4))
    aug = AugParams(
        flip_h=jnp.zeros((1,), bool),
        flip_v=jnp.zeros((1,), bool),
        rot=jnp.zeros((1,)),
        scale=jnp.full((1,), 2.0),
        trans=jnp.zeros((1, 3)),
    )
    out = np.asarray(augment_points(pts, aug, shift_height=True))
    np.testing.assert_allclose(out[..., 3], 2.0)
