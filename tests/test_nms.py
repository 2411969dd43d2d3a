"""aligned_3d_nms tests against a NumPy oracle of the reference loop."""
import numpy as np
import jax.numpy as jnp

from nesie_tpu.core import aligned_3d_nms_mask


def np_aligned_nms(boxes, scores, classes, thresh):
    """Oracle mirroring reference box3d_nms.py:129."""
    x1, y1, z1, x2, y2, z2 = boxes.T
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    order = np.argsort(scores)
    pick = []
    while order.size:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        zz1 = np.maximum(z1[i], z1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        zz2 = np.minimum(z2[i], z2[rest])
        inter = (
            np.maximum(0, xx2 - xx1)
            * np.maximum(0, yy2 - yy1)
            * np.maximum(0, zz2 - zz1)
        )
        iou = inter / (area[i] + area[rest] - inter)
        iou = iou * (classes[i] == classes[rest])
        order = rest[iou <= thresh]
    return np.array(sorted(pick))


def _random_case(rng, n=40, num_classes=3):
    centers = rng.uniform(0, 4, size=(n, 3))
    sizes = rng.uniform(0.5, 1.5, size=(n, 3))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], -1).astype(
        np.float32
    )
    scores = rng.uniform(size=n).astype(np.float32)
    classes = rng.integers(0, num_classes, size=n).astype(np.int32)
    return boxes, scores, classes


def test_matches_oracle(rng):
    for _ in range(5):
        boxes, scores, classes = _random_case(rng)
        keep = np.asarray(
            aligned_3d_nms_mask(
                jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.25
            )
        )
        want = np_aligned_nms(boxes, scores, classes, 0.25)
        np.testing.assert_array_equal(np.flatnonzero(keep), want)


def test_different_classes_never_suppress(rng):
    boxes = np.array([[0, 0, 0, 1, 1, 1], [0, 0, 0, 1, 1, 1]], np.float32)
    scores = np.array([0.9, 0.5], np.float32)
    classes = np.array([0, 1], np.int32)
    keep = np.asarray(
        aligned_3d_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.25)
    )
    assert keep.all()


def test_fixpoint_matches_sequential_random(rng):
    """The whole-vector fixpoint solver equals the sequential greedy loop
    on arbitrary (asymmetric) suppression relations, including ties."""
    from nesie_tpu.core.nms import (_greedy_keep_sequential,
                                    greedy_keep_fixpoint)

    for trial in range(20):
        n = int(rng.integers(1, 60))
        sup = jnp.asarray(rng.random((n, n)) < rng.uniform(0.05, 0.6))
        # quantized scores force plenty of exact ties
        scores = jnp.asarray(
            rng.integers(0, 5, size=n).astype(np.float32) / 4.0
        )
        valid = jnp.asarray(rng.random(n) < 0.8)
        want = np.asarray(_greedy_keep_sequential(sup, scores, valid))
        got = np.asarray(greedy_keep_fixpoint(sup, scores, valid))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_fixpoint_long_suppression_chain():
    """Worst-case convergence: a pure chain i -> i+1 (greedy keeps the
    even-ranked boxes; chain depth = n)."""
    from nesie_tpu.core.nms import greedy_keep_fixpoint

    n = 31
    sup = jnp.eye(n, k=1, dtype=bool)  # i suppresses i+1 only
    scores = jnp.arange(n, 0, -1).astype(jnp.float32)  # order = index
    keep = np.asarray(
        greedy_keep_fixpoint(sup, scores, jnp.ones(n, bool))
    )
    np.testing.assert_array_equal(keep, np.arange(n) % 2 == 0)


def test_valid_mask(rng):
    boxes, scores, classes = _random_case(rng, n=10)
    valid = np.zeros(10, bool)
    valid[:5] = True
    keep = np.asarray(
        aligned_3d_nms_mask(
            jnp.asarray(boxes),
            jnp.asarray(scores),
            jnp.asarray(classes),
            0.25,
            valid_mask=jnp.asarray(valid),
        )
    )
    assert not keep[5:].any()
