"""ScanNet-style instance segmentation evaluation (reference
mmdet3d/models/utils/eval.py — the standalone instance-seg benchmark):
greedy matching of predicted instance point-masks to GT instances by mask
IoU, per-class average precision at configurable overlap thresholds.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from .indoor_eval import average_precision


def mask_iou(pred_mask, gt_mask):
    inter = np.logical_and(pred_mask, gt_mask).sum()
    union = np.logical_or(pred_mask, gt_mask).sum()
    return inter / max(union, 1)


def evaluate_instance_segmentation(
    gt_annos,
    dt_annos,
    iou_thrs=(0.25, 0.5),
    class_names=None,
):
    """Args:
        gt_annos: per scene: dict(masks (G, N) bool, labels (G,)).
        dt_annos: per scene: dict(masks (S, N) bool, scores (S,), labels (S,)).
    Returns:
        dict of per-class AP + mAP per threshold.
    """
    per_class = defaultdict(lambda: {"npos": 0, "dets": []})

    for sid, (gt, dt) in enumerate(zip(gt_annos, dt_annos)):
        gt_by_cls = defaultdict(list)
        for m, l in zip(gt["masks"], gt["labels"]):
            gt_by_cls[int(l)].append(m)
            per_class[int(l)]["npos"] += 1
        for m, s, l in zip(dt["masks"], dt["scores"], dt["labels"]):
            ious = [mask_iou(m, g) for g in gt_by_cls.get(int(l), [])]
            per_class[int(l)]["dets"].append(
                (float(s), sid, np.asarray(ious))
            )

    results = {}
    maps = {t: [] for t in iou_thrs}
    for cls, data in sorted(per_class.items()):
        if data["npos"] == 0:
            continue
        dets = sorted(data["dets"], key=lambda d: -d[0])
        for t in iou_thrs:
            matched = defaultdict(set)
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for i, (score, sid, ious) in enumerate(dets):
                jbest, best = -1, t
                for j, iou in enumerate(ious):
                    if iou > best and j not in matched[sid]:
                        jbest, best = j, iou
                if jbest >= 0:
                    tp[i] = 1
                    matched[sid].add(jbest)
                else:
                    fp[i] = 1
            rec = np.cumsum(tp) / data["npos"]
            prec = np.cumsum(tp) / np.maximum(
                np.cumsum(tp) + np.cumsum(fp), 1e-9
            )
            ap = average_precision(rec, prec) if len(dets) else 0.0
            name = class_names[cls] if class_names else str(cls)
            results[f"{name}_AP_{t:.2f}"] = ap
            maps[t].append(ap)
    for t in iou_thrs:
        results[f"mAP_{t:.2f}"] = float(np.mean(maps[t])) if maps[t] else 0.0
    return results
