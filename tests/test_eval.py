"""Evaluation-path tests: numpy pairwise IoU and indoor mAP."""
import numpy as np

from nesie_tpu.eval.indoor_eval import average_precision, indoor_eval
from nesie_tpu.eval.np_iou import pairwise_iou3d


def test_pairwise_iou_identity():
    b = np.array([[0, 0, 0, 2, 1, 1, 0.3], [3, 3, 3, 1, 1, 1, 0.0]], np.float32)
    iou = pairwise_iou3d(b, b)
    np.testing.assert_allclose(np.diag(iou), [1, 1], atol=1e-5)
    assert iou[0, 1] == 0


def test_pairwise_iou_matches_jax(rng):
    import jax.numpy as jnp
    from nesie_tpu.core.iou import iou3d

    a = rng.uniform(0.5, 2.0, size=(6, 7)).astype(np.float32)
    b = rng.uniform(0.5, 2.0, size=(6, 7)).astype(np.float32)
    a[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    b[:, 6] = rng.uniform(-np.pi, np.pi, 6)
    mat = pairwise_iou3d(a, b)
    aligned = np.asarray(iou3d(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(np.diag(mat), aligned, atol=1e-4)


def test_average_precision_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert average_precision(rec, prec) == 1.0


def test_indoor_eval_perfect_detection():
    gt = [dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0]]), labels=np.array([0]))]
    dt = [
        dict(
            boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0]]),
            scores=np.array([0.9]),
            labels=np.array([0]),
        )
    ]
    res = indoor_eval(gt, dt)
    assert res["mAP_0.25"] == 1.0
    assert res["mAP_0.50"] == 1.0


def test_indoor_eval_miss_and_fp():
    gt = [
        dict(
            boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0], [5, 5, 5, 1, 1, 1, 0.0]]),
            labels=np.array([0, 0]),
        )
    ]
    dt = [
        dict(
            boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0], [9, 9, 9, 1, 1, 1, 0.0]]),
            scores=np.array([0.9, 0.8]),
            labels=np.array([0, 0]),
        )
    ]
    res = indoor_eval(gt, dt)
    # 1 TP of 2 GT, 1 FP: AP = 0.5 (precision 1 at recall 0.5)
    np.testing.assert_allclose(res["mAP_0.25"], 0.5, atol=1e-6)


def test_indoor_eval_duplicate_detection_is_fp():
    gt = [dict(boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0]]), labels=np.array([0]))]
    dt = [
        dict(
            boxes=np.array([[0, 0, 0, 1, 1, 1, 0.0], [0, 0, 0, 1, 1, 1, 0.0]]),
            scores=np.array([0.9, 0.8]),
            labels=np.array([0, 0]),
        )
    ]
    res = indoor_eval(gt, dt)
    np.testing.assert_allclose(res["mAP_0.25"], 1.0, atol=1e-6)  # TP first, dup FP after full recall


def test_instance_seg_eval():
    from nesie_tpu.eval.instance_seg import evaluate_instance_segmentation

    N = 100
    g1 = np.zeros(N, bool); g1[:30] = True
    g2 = np.zeros(N, bool); g2[50:80] = True
    gt = [dict(masks=np.stack([g1, g2]), labels=np.array([0, 1]))]
    # perfect pred for g1, overlapping-but-poor for g2, plus an FP
    p2 = np.zeros(N, bool); p2[50:60] = True
    p3 = np.zeros(N, bool); p3[90:] = True
    dt = [dict(masks=np.stack([g1, p2, p3]),
               scores=np.array([0.9, 0.8, 0.7]),
               labels=np.array([0, 1, 0]))]
    res = evaluate_instance_segmentation(gt, dt)
    assert res["0_AP_0.25"] == 1.0         # matched before the FP
    assert res["1_AP_0.50"] == 0.0         # IoU 10/30 < 0.5
    assert 0 < res["mAP_0.25"] <= 1.0
