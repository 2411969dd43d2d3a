"""High-level API surface (reference mmdet3d/apis/inference.py):
inference_segmentor and show_result_meshlab artifact dumps."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def test_inference_segmentor_and_meshlab_dump(tmp_path):
    from nesie_tpu.apis import inference_segmentor, show_result_meshlab
    from nesie_tpu.nn.segmentor import PointNet2Segmentor

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, size=(1024, 3)).astype(np.float32)
    model = PointNet2Segmentor(
        num_classes=6, num_points=(128, 32, 16, 8),
        sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
        fp_channels=((32, 32), (32, 32), (32, 32), (32, 32, 32)),
        head_channels=32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 4)))

    res = inference_segmentor(model, variables, pts, num_points=256)
    assert res["semantic_mask"].shape == (256,)
    assert res["seg_logits"].shape == (256, 6)
    assert res["semantic_mask"].max() < 6

    boxes = np.array([[0.0, 0, 0, 1, 1, 1, 0.2]])
    proj = np.hstack([np.eye(3), np.zeros((3, 1))])
    img = np.zeros((60, 80, 3), np.uint8)
    out = show_result_meshlab(
        tmp_path, "scene0", points=res["points"], pred_boxes=boxes,
        gt_boxes=boxes, seg_labels=res["semantic_mask"], img=img, proj=proj)
    names = {p.name for p in out.iterdir()}
    assert {"scene0_points.obj", "scene0_pred.obj", "scene0_gt.obj",
            "scene0_seg.obj", "scene0_pred_img.png"} <= names
