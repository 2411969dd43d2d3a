"""High-level inference API (reference mmdet3d/apis/inference.py:35,72).

``init_detector`` builds a model + restores weights;
``inference_detector`` runs one point cloud (.bin / .npy / array) through
the full pipeline and returns detected boxes.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from nesie_tpu.config import ExperimentConfig, get_config
from nesie_tpu.data import io
from nesie_tpu.eval.postprocess import decode_and_nms, expand_per_class


class Detector:
    def __init__(self, cfg: ExperimentConfig, state, model):
        self.cfg = cfg
        self.state = state
        self.model = model
        self._key = jax.random.PRNGKey(cfg.seed)

    def __call__(self, points):
        """points: (N, >=3) numpy array or path to .bin/.npy.

        Returns dict(boxes_3d (S, 7) gravity-centered, scores_3d, labels_3d).
        """
        if isinstance(points, (str, Path)):
            p = Path(points)
            if p.suffix == ".npy":
                points = np.load(p)[:, :3]
            else:
                points = io.load_points_bin(p)
        pts = io.add_height(np.asarray(points, np.float32)[:, :3])
        rng = np.random.default_rng(self.cfg.seed)
        pts = io.sample_points(pts, self.cfg.data.num_points, rng)[None]

        self._key, sub = jax.random.split(self._key)
        out = self.model.apply(
            {"params": self.state.params, "batch_stats": self.state.batch_stats},
            jnp.asarray(pts),
            self.cfg.test.sample_mod,
            sub,
            train=False,
            with_jitter=False,
        )
        decoded = decode_and_nms(
            out,
            jnp.asarray(pts),
            nms_thr=self.cfg.test.nms_thr,
            score_thr=self.cfg.test.score_thr,
            use_iou_for_nms=self.cfg.test.use_iou_for_nms,
        )
        decoded = jax.tree.map(lambda x: np.asarray(x)[0], decoded)
        boxes, scores, labels = expand_per_class(decoded)
        return dict(boxes_3d=boxes, scores_3d=scores, labels_3d=labels)


def init_detector(config_name: str, checkpoint_dir=None) -> Detector:
    from nesie_tpu.train import runner
    from nesie_tpu.train.runner import CheckpointManager

    cfg = get_config(config_name)
    model = runner.build_model(cfg)
    state, _ = runner.init_state(cfg, model, steps_per_epoch=1)
    if checkpoint_dir is not None:
        mgr = CheckpointManager(Path(checkpoint_dir).parent)
        state, _, _ = mgr.restore(state)
    return Detector(cfg, state, model)


def inference_detector(detector: Detector, points):
    return detector(points)


def inference_segmentor(model, variables, points, num_points=None,
                        seed: int = 0):
    """Per-point semantic labels (reference apis/inference.py:253
    ``inference_segmentor``): load/subsample one cloud, forward the
    segmentor, return dict(semantic_mask, seg_logits).

    Args:
        model: ``nn.segmentor.PointNet2Segmentor`` (or compatible);
        variables: its flax variables; points: (N, >=3) array or
        .bin/.npy path.
    """
    if isinstance(points, (str, Path)):
        p = Path(points)
        points = np.load(p) if p.suffix == ".npy" else io.load_points_bin(p)
    pts = io.add_height(np.asarray(points, np.float32)[:, :3])
    if num_points is not None:
        rng = np.random.default_rng(seed)
        pts = io.sample_points(pts, num_points, rng)
    out = model.apply(variables, jnp.asarray(pts)[None], train=False)
    logits = out["seg_logits"] if isinstance(out, dict) else out
    logits = np.asarray(logits)[0]
    return dict(semantic_mask=np.argmax(logits, axis=-1),
                seg_logits=logits, points=pts)


def show_result_meshlab(out_dir, name, points=None, gt_boxes=None,
                        pred_boxes=None, img=None, proj=None,
                        seg_labels=None, palette=None):
    """Dump meshlab-style artifacts (reference apis/inference.py:292-505
    ``show_det_result_meshlab``/``show_seg_result_meshlab``/
    ``show_proj_det_result_meshlab``): ``<name>_points.obj`` /
    ``_gt.obj`` / ``_pred.obj``, a colorized segmentation cloud, and a
    box-projection image when calibration is given. Returns the output
    directory."""
    from nesie_tpu.eval.visualize import (draw_bbox3d_on_img, show_result,
                                          write_points_obj)

    out = show_result(out_dir, name, points=points, gt_boxes=gt_boxes,
                      pred_boxes=pred_boxes)
    if seg_labels is not None and points is not None:
        if palette is None:
            rng = np.random.default_rng(42)  # stable class colors
            palette = rng.integers(0, 256,
                                   size=(int(seg_labels.max()) + 1, 3))
        write_points_obj(out / f"{name}_seg.obj",
                         np.asarray(points)[:, :3],
                         colors=np.asarray(palette)[np.asarray(seg_labels)])
    if img is not None and proj is not None and pred_boxes is not None \
            and len(pred_boxes):
        import imageio.v3 as iio

        drawn = draw_bbox3d_on_img(np.asarray(pred_boxes), np.asarray(img),
                                   np.asarray(proj))
        iio.imwrite(out / f"{name}_pred_img.png", drawn.astype(np.uint8))
    return out
