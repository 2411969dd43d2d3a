"""Teacher pseudo-label generation (reference
VoteNetNesie.get_pseudo_labels, votenet_nesie.py:129-299), fully on-device
with static shapes.

The reference moves the top-64 candidates to host numpy for its LHS NMS
(votenet_nesie.py:219-260); here that NMS is a masked ``lax.while_loop`` so
the whole teacher->pseudo-label path stays inside one jitted step.

Documented deviations from the reference (see REFERENCE_QUIRKS.md):
  * literal mode (DEFAULT): the reference's actual CBL arithmetic —
    ``classwise_acc`` assigns the c-th *largest* pseudo count to class c
    (votenet_nesie.py:141-147) and the per-proposal threshold indexes the
    flattened class array with class *values* (votenet_nesie.py:161).
    Verified numerically against the reference code itself in
    tests/test_reference_oracle.py.
  * ``literal_reference_cbl=False`` selects the FlexMatch-intended
    semantics instead (own-class threshold ``acc[argmax_cls]``, own-count
    ``count[c] / max(...)``).

The literal mode is the default for two reasons: it reproduces the
reference's shipped training behavior, and a 3-seed controlled A/B on
the synthetic validation pipeline (per-seed random splits, only this
flag differing) scored it higher on both deliverables — semi student
mAP@0.25 0.1244 ± 0.0224 (literal) vs 0.1187 ± 0.0166 (intended),
EMA teacher 0.1306 ± 0.0173 vs 0.1137 ± 0.0350 — and it was the only
arm passing both acceptance gates. See PARITY_RESULTS.md /
studies/study_A.json and REFERENCE_QUIRKS.md item 1.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PseudoLabelConfig:
    num_classes: int = 18
    max_num_obj: int = 64
    use_cbl: bool = True
    thresh_warmup: bool = True
    cls_thr_base: float = 0.7
    cls_thr_scale: float = 0.3
    cls_thr_cap: float = 0.95
    obj_thr: float = 0.9
    iou_thr_base: float = 0.25
    iou_thr_scale: float = 0.5
    iou_thr_cap: float = 0.35
    lhs_nms_iou: float = 0.25
    dataset_name: str = "ScanNet"
    # True (default) = the reference's literal CBL arithmetic (sorted-count
    # class status, votenet_nesie.py:141-147, and class-value double
    # indexing of the per-proposal threshold, votenet_nesie.py:161); False
    # = the FlexMatch-intended per-class semantics. The literal mode wins
    # the controlled accuracy A/B — see module docstring.
    literal_reference_cbl: bool = True


class PseudoLabels(NamedTuple):
    boxes: jnp.ndarray    # (B, MAX_OBJ, 7) bottom-centered teacher boxes
    labels: jnp.ndarray   # (B, MAX_OBJ) int32 argmax classes
    valid: jnp.ndarray    # (B, MAX_OBJ) bool
    quality: jnp.ndarray  # (B, MAX_OBJ, 6) per-side quality weights


def classwise_acc(ulb_list, ulb_flag, num_labeled: int, thresh_warmup: bool,
                  literal: bool = False):
    """FlexMatch-style class-balanced learning status.

    Args:
        ulb_list: (num_unlabeled, C) per-scan pseudo-label class histograms.
        ulb_flag: (num_unlabeled,) 1.0 until a scan was first visited.
        num_labeled: number of labeled scans (len(lb_map)).
        literal: assign the c-th *largest* count to class c, exactly as the
            reference's ``classwise_acc[i] = sorted[i] / ...`` loop does
            (votenet_nesie.py:141-147, indexing the descending-sorted counts
            by class id).
    Returns:
        (C,) acc in [0, 1] after the x/(2-x) convexity warp.
    """
    counts = jnp.sum(ulb_list, axis=0)  # (C,)
    if literal:
        counts = -jnp.sort(-counts)  # descending; class c gets rank-c count
    num_unlabeled = ulb_list.shape[0]
    if thresh_warmup:
        ulb_count = 10.0 * jnp.sum(ulb_flag) * num_labeled / num_unlabeled
        denom = jnp.maximum(jnp.max(counts), ulb_count)
    else:
        denom = jnp.max(counts)
    acc = counts / jnp.maximum(denom, 1e-6)
    return acc / (2.0 - acc)


def lhs_nms_keep_mask(boxes6, scores, classes, thresh: float):
    """Lenient greedy NMS that also keeps the better half of every
    suppressed cluster (reference lhs_3d_faster_samecls,
    votenet_nesie.py:733-779).

    Args:
        boxes6: (K, 6) minmax boxes; scores: (K,); classes: (K,) int.
    Returns:
        (K,) bool keep mask.
    """
    k = boxes6.shape[0]
    lt = jnp.maximum(boxes6[:, None, :3], boxes6[None, :, :3])
    rb = jnp.minimum(boxes6[:, None, 3:], boxes6[None, :, 3:])
    whd = jnp.clip(rb - lt, 0.0)
    inter = whd[..., 0] * whd[..., 1] * whd[..., 2]
    d = boxes6[:, 3:] - boxes6[:, :3]
    vol = d[:, 0] * d[:, 1] * d[:, 2] + 1e-8
    iou = inter / (vol[:, None] + vol[None, :] - inter)
    iou = iou * (classes[:, None] == classes[None, :])

    alive = jnp.ones((k,), bool)
    keep = jnp.zeros((k,), bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, keep = state
        i = jnp.argmax(jnp.where(alive, scores, neg_inf))
        keep = keep.at[i].set(True)
        others = alive.at[i].set(False)
        suppressed = others & (iou[i] > thresh)
        n_sup = jnp.sum(suppressed)
        # keep the top floor(n/2) suppressed boxes by score
        sup_scores = jnp.where(suppressed, scores, neg_inf)
        rank = jnp.sum(
            (sup_scores[None, :] > sup_scores[:, None]), axis=1
        )  # rank among suppressed (0 = best)
        keep = keep | (suppressed & (rank < n_sup // 2))
        alive = others & ~suppressed
        return alive, keep

    _, keep = jax.lax.while_loop(cond, body, (alive, keep))
    return keep


def quality_poly(side_scores):
    """q(s) = 5/3 s^2 - 8/3 s + 1 (votenet_nesie.py:201)."""
    return 5.0 / 3.0 * side_scores * side_scores - 8.0 / 3.0 * side_scores + 1.0


def get_pseudo_labels(
    teacher_results,
    acc,
    cfg: PseudoLabelConfig = PseudoLabelConfig(),
) -> PseudoLabels:
    """Filter teacher predictions into at most ``max_num_obj`` pseudo boxes.

    Args:
        teacher_results: head results dict from the teacher forward
            (weak view).
        acc: (C,) class-balanced learning status from ``classwise_acc``
            (ignored when cfg.use_cbl is False).
    Returns:
        PseudoLabels with *bottom-centered* boxes (the reference converts
        to bottom z at votenet_nesie.py:149).
    """
    C = cfg.num_classes
    sem = teacher_results["sem_scores"]  # (B, P, C) logits
    B, P = sem.shape[:2]

    bbox = teacher_results["bbox_preds"]  # gravity-centered
    bbox = bbox.at[..., 2].add(-0.5 * bbox[..., 5])  # -> bottom-centered

    max_cls = jnp.max(sem, axis=-1)
    argmax_cls = jnp.argmax(sem, axis=-1)  # (B, P)

    if cfg.use_cbl:
        if cfg.literal_reference_cbl:
            # the reference's double indexing (votenet_nesie.py:161):
            # thr[j] = acc[cls_flat[cls_flat[j]]] — class *values* index the
            # flattened class array positionally. jnp clamps out-of-range
            # positions (only reachable when B*P < C, where the reference
            # itself would crash).
            flat = argmax_cls.reshape(-1)
            thr = acc[flat[flat]].reshape(argmax_cls.shape)
        else:
            thr = acc[argmax_cls]  # own-class status (see module docstring)
        cls_thr = jnp.minimum(
            cfg.cls_thr_base + cfg.cls_thr_scale * thr, cfg.cls_thr_cap
        )
        iou_thr = jnp.minimum(
            cfg.iou_thr_base + cfg.iou_thr_scale * thr, cfg.iou_thr_cap
        )
    else:
        cls_thr = jnp.full_like(max_cls, 0.9)
        iou_thr = jnp.full_like(max_cls, cfg.iou_thr_base)

    cls_mask = max_cls > cls_thr

    obj = jax.nn.softmax(teacher_results["obj_scores"], axis=-1)
    pos_obj = obj[..., 1]
    objectness_mask = pos_obj > cfg.obj_thr

    iou_pred = jnp.take_along_axis(
        teacher_results["iou_scores"], argmax_cls[..., None], axis=-1
    )[..., 0]
    iou_mask = iou_pred > iou_thr
    final_mask = cls_mask & objectness_mask & iou_mask

    side_at_cls = jnp.take_along_axis(
        teacher_results["side_scores"],
        argmax_cls[..., None, None].repeat(6, axis=-2),
        axis=-1,
    )[..., 0]  # (B, P, 6)
    quality = quality_poly(side_at_cls)

    # top MAX_NUM_OBJ candidates by pos_obj * iou * mask (clamped when the
    # model has fewer proposals than MAX_NUM_OBJ, e.g. tiny test configs —
    # the trailing slots stay invalid)
    k = min(cfg.max_num_obj, P)
    rank_score = pos_obj * iou_pred * final_mask
    _, inds = jax.lax.top_k(rank_score, k)  # (B, k)
    if k < cfg.max_num_obj:
        inds = jnp.concatenate(
            [inds, jnp.zeros((B, cfg.max_num_obj - k), inds.dtype)], axis=1
        )

    def gather(x):
        idx = inds
        while idx.ndim < x.ndim:
            idx = idx[..., None]
        return jnp.take_along_axis(x, idx, axis=1)

    sel_mask = gather(final_mask)
    if k < cfg.max_num_obj:  # padded slots are never valid
        slot = jnp.arange(cfg.max_num_obj)[None, :]
        sel_mask = sel_mask & (slot < k)
    sel_boxes = gather(bbox)
    sel_labels = gather(argmax_cls)
    sel_quality = gather(quality)
    sel_scores = gather(pos_obj) * gather(iou_pred)  # unmasked lhs score

    # LHS NMS on axis-aligned corner-minmax boxes. The reference builds the
    # corners around the *bottom* z as if it were the center
    # (votenet_nesie.py:149+229) and zeroes the heading for ScanNet.
    from nesie_tpu.core.boxes import box_corners, corners_minmax

    nms_boxes = sel_boxes
    if cfg.dataset_name == "ScanNet":
        nms_boxes = nms_boxes.at[..., 6].set(0.0)
    mm = corners_minmax(box_corners(nms_boxes))

    keep = jax.vmap(lambda b, s, c: lhs_nms_keep_mask(b, s, c, cfg.lhs_nms_iou))(
        mm, sel_scores, sel_labels
    )
    valid = sel_mask & keep

    return PseudoLabels(
        boxes=sel_boxes * valid[..., None],
        labels=(sel_labels * valid).astype(jnp.int32),
        valid=valid,
        quality=sel_quality * valid[..., None],
    )
