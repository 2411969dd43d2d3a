"""Target-assignment tests vs hand-computed / oracle expectations."""
import numpy as np
import jax.numpy as jnp

from nesie_tpu.train.targets import get_targets, vote_targets_single


def test_vote_targets_single_box():
    pts = np.array([[0.0, 0.0, 0.5], [5.0, 5.0, 5.0]], np.float32)
    boxes = np.zeros((3, 7), np.float32)
    boxes[0] = [0, 0, 0, 1, 1, 1, 0]  # bottom-centered, contains pt0
    valid = np.array([True, False, False])
    votes, mask = vote_targets_single(
        jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(valid)
    )
    votes, mask = np.asarray(votes), np.asarray(mask)
    np.testing.assert_array_equal(mask, [1, 0])
    # gravity center (0,0,0.5) - pt0 = (0,0,0), replicated to 3 slots
    np.testing.assert_allclose(votes[0], np.zeros(9), atol=1e-6)
    np.testing.assert_allclose(votes[1], np.zeros(9), atol=1e-6)


def test_vote_targets_two_boxes():
    pts = np.array([[0.0, 0.0, 0.5]], np.float32)
    boxes = np.zeros((4, 7), np.float32)
    boxes[0] = [0.1, 0, 0, 1, 1, 1, 0]
    boxes[1] = [-0.1, 0, 0, 1, 1, 1, 0]
    valid = np.array([True, True, False, False])
    votes, mask = vote_targets_single(
        jnp.asarray(pts), jnp.asarray(boxes), jnp.asarray(valid)
    )
    votes = np.asarray(votes)[0]
    # slot0 = box0 vote, slot1 = box1 vote, slot2 = copy of slot0
    np.testing.assert_allclose(votes[0:3], [0.1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(votes[3:6], [-0.1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(votes[6:9], [0.1, 0, 0], atol=1e-6)


def test_assignment_and_objectness():
    B, N, P, MG = 1, 8, 4, 4
    pts = np.zeros((B, N, 3), np.float32)
    gt_boxes = np.zeros((B, MG, 7), np.float32)
    gt_boxes[0, 0] = [1, 1, 0, 1, 1, 1, 0]
    gt_boxes[0, 1] = [5, 5, 0, 1, 1, 1, 0]
    gt_labels = np.zeros((B, MG), np.int32)
    gt_labels[0, :2] = [2, 3]
    gt_valid = np.zeros((B, MG), bool)
    gt_valid[0, :2] = True
    # proposals: near gt0, near gt1, mid-range (0.3 < d < 0.6 -> ignored), far
    agg = np.array(
        [[[1.0, 1.0, 0.45], [5.0, 5.0, 0.55], [1.45, 1.0, 0.5], [40, 40, 0]]],
        np.float32,
    )
    t = get_targets(
        jnp.asarray(pts),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_valid),
        jnp.asarray(agg),
    )
    assignment = np.asarray(t.assignment)[0]
    np.testing.assert_array_equal(assignment[:2], [0, 1])
    obj = np.asarray(t.objectness_targets)[0]
    np.testing.assert_array_equal(obj, [1, 1, 0, 0])
    mask_t = np.asarray(t.mask_targets)[0]
    np.testing.assert_array_equal(mask_t[:2], [2, 3])
    # bbox targets are gravity-centered
    bt = np.asarray(t.bbox_targets)[0, 0]
    np.testing.assert_allclose(bt, [1, 1, 0.5, 1, 1, 1, 0], atol=1e-6)
    # objectness weights: proposals 0,1 (pos) and 3 (far neg) count
    ow = np.asarray(t.objectness_weights)[0]
    assert ow[2] == 0 and ow[3] > 0
    np.testing.assert_allclose(ow.sum(), 1.0, atol=1e-5)


def test_empty_scene_uses_fake_zero_box():
    B, N, P, MG = 1, 4, 2, 3
    pts = np.zeros((B, N, 3), np.float32)
    gt_boxes = np.zeros((B, MG, 7), np.float32)
    gt_labels = np.zeros((B, MG), np.int32)
    gt_valid = np.zeros((B, MG), bool)
    agg = np.array([[[0.1, 0, 0], [9, 9, 9]]], np.float32)
    t = get_targets(
        jnp.asarray(pts),
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_valid),
        jnp.asarray(agg),
    )
    # proposal near origin is "positive" against the fake zero box,
    # matching the reference's empty-scene fallback
    np.testing.assert_array_equal(np.asarray(t.objectness_targets)[0], [1, 0])
    np.testing.assert_array_equal(np.asarray(t.assignment)[0], [0, 0])
    assert np.asarray(t.valid_gt_weights).sum() == 0
