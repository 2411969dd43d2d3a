"""Decode+NMS and full eval-path tests using oracle head outputs."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.data.synthetic import make_synthetic_scenes
from nesie_tpu.data.dataset import ScanNetScenes
from nesie_tpu.eval import decode_and_nms, indoor_eval
from nesie_tpu.eval.postprocess import expand_per_class

C = 4
P = 16


def _fake_results(gt_boxes, gt_labels, gt_valid):
    """Build head outputs that perfectly predict the GT."""
    B, MG = gt_labels.shape
    bbox = np.zeros((B, P, 7), np.float32)
    obj = np.full((B, P, 2), [5.0, -5.0], np.float32)  # background
    sem = np.zeros((B, P, C), np.float32)
    iou = np.full((B, P, C), 0.9, np.float32)
    for b in range(B):
        k = 0
        for g in range(MG):
            if not gt_valid[b, g] or k >= P:
                continue
            bbox[b, k] = gt_boxes[b, g]
            bbox[b, k, 2] += gt_boxes[b, g, 5] / 2  # bottom -> gravity
            obj[b, k] = [-5.0, 5.0]
            sem[b, k, gt_labels[b, g]] = 10.0
            k += 1
        # park the unused proposals far away so they can't match anything
        bbox[b, k:] = [100, 100, 100, 0.1, 0.1, 0.1, 0]
    return dict(
        bbox_preds=jnp.asarray(bbox),
        obj_scores=jnp.asarray(obj),
        sem_scores=jnp.asarray(sem),
        iou_scores=jnp.asarray(iou),
    )


def test_perfect_predictions_give_perfect_map():
    scenes = make_synthetic_scenes(3, num_classes=C, seed=1)
    ds = ScanNetScenes(scenes=scenes)
    rng = np.random.default_rng(0)
    batch = ds.eval_batch([0, 1, 2], rng, num_points=4096)

    results = _fake_results(
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"]
    )
    decoded = decode_and_nms(results, jnp.asarray(batch["points"]))
    decoded = jax.tree.map(np.asarray, decoded)

    gt_annos, dt_annos = [], []
    for b in range(3):
        boxes, scores, labels = expand_per_class(
            {k: v[b] for k, v in decoded.items()}
        )
        dt_annos.append(dict(boxes=boxes, scores=scores, labels=labels))
        gb = batch["gt_boxes"][b][batch["gt_valid"][b]].copy()
        gb[:, 2] += gb[:, 5] / 2
        gt_annos.append(
            dict(boxes=gb, labels=batch["gt_labels"][b][batch["gt_valid"][b]])
        )
    res = indoor_eval(gt_annos, dt_annos)
    assert res["mAP_0.25"] > 0.99, res
    assert res["mAP_0.50"] > 0.99, res


def test_decode_filters_low_scores_and_empty_boxes():
    pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 512, 3)).astype(np.float32))
    bbox = np.tile([50.0, 50, 50, 1, 1, 1, 0], (1, P, 1)).astype(np.float32)  # empty boxes
    results = dict(
        bbox_preds=jnp.asarray(bbox),
        obj_scores=jnp.asarray(np.full((1, P, 2), [-5.0, 5.0], np.float32)),
        sem_scores=jnp.zeros((1, P, C)),
        iou_scores=jnp.full((1, P, C), 0.9),
    )
    decoded = decode_and_nms(results, pts)
    assert not np.asarray(decoded["selected"]).any()  # all empty -> dropped


def test_iou_weighting_scales_scores():
    pts = jnp.asarray(
        np.random.default_rng(0).uniform(-0.4, 0.4, (1, 512, 3)).astype(np.float32)
    )
    bbox = np.tile([0.0, 0, 0, 1, 1, 1, 0], (1, P, 1)).astype(np.float32)
    results = dict(
        bbox_preds=jnp.asarray(bbox),
        obj_scores=jnp.asarray(np.full((1, P, 2), [-5.0, 5.0], np.float32)),
        sem_scores=jnp.zeros((1, P, C)),
        iou_scores=jnp.full((1, P, C), 0.5),
    )
    with_iou = decode_and_nms(results, pts, use_iou_for_nms=True)
    without = decode_and_nms(results, pts, use_iou_for_nms=False)
    ratio = float(with_iou["obj_scores"][0, 0] / without["obj_scores"][0, 0])
    np.testing.assert_allclose(ratio, 0.5, atol=1e-5)


def test_iou_opt_refines_boxes():
    """Test-time IoU optimization runs and changes the boxes."""
    from nesie_tpu.eval.iou_opt import iou_opt_boxes
    from nesie_tpu.nn.detector import VoteNetNesie

    model = VoteNetNesie(
        num_classes=C, reg_max=8, num_proposal=P,
        num_points=(64, 32, 16, 16), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32),) + ((32, 32, 32),) * 3,
        fp_channels=((32, 32), (32, 32)),
    )
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (1, 256, 4))
    variables = model.init({"params": rng}, pts, "seed", rng, train=False)
    out = model.apply(variables, pts, "seed", rng, train=False)
    refined = iou_opt_boxes(model, variables, out, opt_rate=1e-2, opt_step=3)
    before = np.asarray(out["bbox_preds"])
    after = np.asarray(refined["bbox_preds"])
    assert np.isfinite(after).all()
    assert not np.allclose(before[..., :6], after[..., :6])
    # headings untouched
    np.testing.assert_allclose(before[..., 6], after[..., 6])

    # it is gradient ASCENT on the predicted IoU: the summed quality score
    # of the refined boxes must not decrease
    def iou_sum(bbox):
        heading_q = jnp.zeros_like(bbox[..., 6])
        s = model.apply(
            variables, out, bbox[..., :3], bbox[..., 3:6], heading_q,
            method=VoteNetNesie.quality_scores,
        )
        return float(jnp.sum(s))

    assert iou_sum(jnp.asarray(after)) >= iou_sum(jnp.asarray(before)) - 1e-6
