"""Semi-supervised teacher-student training (reference
VoteNetNesie.forward_train, votenet_nesie.py:69-127 + NesieHead.unsup_loss,
nesie_head.py:414-509).

Batch layout (static): the first ``n_labeled`` samples are the labeled
scenes (strong view + GT), the rest are unlabeled (strong view for the
student, weak view for the teacher). The reference builds exactly this
concatenation in ``combine_data`` (votenet_nesie.py:36).

The teacher is ``state.ema_params`` applied to the weak view; pseudo boxes
are re-projected weak->strong by replaying the recorded AugParams
(a vectorized device op replacing the reference's per-sample host box
mutation, votenet_nesie.py:310-324).

Per-scan pseudo-label class histograms (the reference runner's
``ulb_list``/``ulb_flag``, simi_epoch_based_runner.py:72-86) live in a
``UlbState`` device array updated functionally each step.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from nesie_tpu.data.augment import (
    AugParams,
    augment_boxes,
    augment_points,
    reproject_boxes,
)
from nesie_tpu.losses import iou_3d_loss, softmax_cross_entropy, surface_loss_mse
from .pseudo_label import PseudoLabelConfig, classwise_acc, get_pseudo_labels
from .state import TrainState, ema_update
from .sup_loss import NesieLossConfig, nesie_supervised_loss, sigma_poly
from .targets import HeadTargets, get_targets


class UlbState(NamedTuple):
    ulb_list: jnp.ndarray  # (num_unlabeled_scans, C) pseudo class histograms
    ulb_flag: jnp.ndarray  # (num_unlabeled_scans,) 1.0 until first visited

    @staticmethod
    def create(num_unlabeled: int, num_classes: int):
        return UlbState(
            ulb_list=jnp.zeros((num_unlabeled, num_classes), jnp.float32),
            ulb_flag=jnp.ones((num_unlabeled,), jnp.float32),
        )


def nesie_unsup_loss(
    results,
    targets: HeadTargets,
    pseudo_quality,  # (B, MAX_OBJ, 6), zeroed on invalid slots
    cfg: NesieLossConfig = NesieLossConfig(),
    un_label_weight: float = 2.0,
):
    """Quality-weighted unsupervised losses (nesie_head.py:414-509)."""
    C = cfg.num_classes
    B, P = results["obj_scores"].shape[:2]
    flat = B * P

    quality_side = jnp.take_along_axis(
        pseudo_quality, targets.assignment[..., None], axis=1
    )  # (B, P, 6)
    quality_mean = jnp.mean(quality_side, axis=-1)

    losses = {}

    # center (identical form to sup)
    src = results["bbox_preds"][..., :3]
    dst = targets.center_targets
    d = jnp.sum((src[:, :, None] - dst[:, None]) ** 2, axis=-1)
    s2d = jnp.min(d, axis=2) * targets.box_loss_weights * cfg.center_src_weight
    d2s = jnp.min(d, axis=1) * targets.valid_gt_weights * cfg.center_dst_weight
    losses["unsup_center_loss"] = jnp.sum(s2d) + jnp.sum(d2s)

    # semantic
    sem_ce = softmax_cross_entropy(results["sem_scores"], targets.mask_targets)
    losses["unsup_semantic_loss"] = cfg.semantic_weight * jnp.sum(
        sem_ce * targets.box_loss_weights
    )

    # sigma from own side scores at semantic argmax
    sem_argmax = jnp.argmax(results["sem_scores"], axis=-1).reshape(flat)
    side_all = results["side_scores"].reshape(flat, 6, C)
    side_at = jnp.take_along_axis(side_all, sem_argmax[:, None, None], axis=2)[..., 0]
    sigma = sigma_poly(side_at)
    sigma_mean = jnp.mean(sigma, axis=-1)

    bbox_targets = targets.bbox_targets.reshape(flat, -1)

    # rotated IoU, weight additionally scaled by teacher quality mean
    iou_weight = (targets.box_loss_weights * quality_mean).reshape(flat)
    raw_iou = (
        cfg.iou_weight
        * iou_3d_loss(results["bbox_preds"].reshape(flat, 7), bbox_targets)
        * iou_weight
    )
    losses["unsup_iou_loss"] = jnp.sum(
        jnp.exp(-sigma_mean) * raw_iou + cfg.alpha * sigma_mean * iou_weight
    )

    # surface, per-side weight scaled by teacher per-side quality
    surface_weight = (
        jnp.repeat(targets.box_loss_weights.reshape(flat)[:, None], 6, axis=1)
        * quality_side.reshape(flat, 6)
    )
    raw_surface = (
        cfg.surface_weight
        * surface_loss_mse(results["surface_pred"].reshape(flat, 6), bbox_targets)
        * surface_weight
    )
    losses["unsup_surface_loss"] = jnp.sum(
        jnp.exp(-sigma) * raw_surface + cfg.alpha * sigma * surface_weight
    )

    losses = {k: un_label_weight * v for k, v in losses.items()}
    return sum(losses.values()), losses


def _tree_slice(tree, start, end):
    return jax.tree.map(lambda x: x[start:end], tree)


def make_semi_train_step(
    model,
    tx,
    n_labeled: int,
    num_labeled_scans: int,
    loss_cfg: NesieLossConfig = NesieLossConfig(),
    pl_cfg: PseudoLabelConfig = PseudoLabelConfig(),
    sample_mod: str = "vote",
    ema_momentum: float = 1e-3,
    ema_warm_up: float = 10.0,
    un_label_weight: float = 2.0,
    pos_distance_thr: float = 0.3,
    neg_distance_thr: float = 0.6,
    head: str = "nesie",
    teacher_jitter: bool = False,
    ema_bn_stats: bool = False,
):
    """Build the jitted semi-supervised step.

    Batch dict fields (B = n_labeled + n_unlabeled, labeled first):
        points_raw_s (B, N, C): un-augmented strong-view point sample.
        points_raw_t (B, N, C): un-augmented weak-view point sample
            (independent subsample of the same scene).
        gt_boxes (B, MAX_GT, 7) / gt_labels / gt_valid: un-augmented GT for
            the labeled prefix (ignored for unlabeled slots).
        aug_s, aug_t: AugParams with leading dim B (applied on device here).
        ulb_scan_idx (B,): index into UlbState tables for unlabeled slots
            (anything, e.g. 0, for labeled slots — they are not scattered).
    Returns step(state, ulb_state, batch, rng) -> (state, ulb_state, metrics).
    """
    if head == "saqe":
        from .saqe_loss import SAQELossConfig, saqe_supervised_loss, saqe_unsup_loss

        saqe_cfg = (
            loss_cfg
            if isinstance(loss_cfg, SAQELossConfig)
            else SAQELossConfig(num_classes=loss_cfg.num_classes)
        )

        def sup_loss_fn(out, targets):
            return saqe_supervised_loss(out, targets, saqe_cfg, phase="semi")

        def unsup_loss_fn(out, targets, quality):
            return saqe_unsup_loss(out, targets, quality, saqe_cfg, un_label_weight)

    else:

        def sup_loss_fn(out, targets):
            return nesie_supervised_loss(out, targets, loss_cfg)

        def unsup_loss_fn(out, targets, quality):
            return nesie_unsup_loss(out, targets, quality, loss_cfg, un_label_weight)

    def step(state: TrainState, ulb_state: UlbState, batch, rng):
        rng_t, rng_s = jax.random.split(rng)
        B = batch["points_raw_s"].shape[0]
        batch = dict(batch)
        batch["points_s"] = augment_points(
            batch["points_raw_s"], batch["aug_s"], shift_height=True
        )
        batch["points_t"] = augment_points(
            batch["points_raw_t"], batch["aug_t"], shift_height=True
        )
        batch["gt_boxes"] = augment_boxes(batch["gt_boxes"], batch["aug_s"])

        # ---- teacher forward on the weak view (train-mode BN stats, updates
        # discarded — the reference shares running buffers between passes) ----
        teacher_out, _ = model.apply(
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            batch["points_t"],
            sample_mod,
            rng_t,
            train=True,
            with_jitter=teacher_jitter,
            mutable=["batch_stats"],
        )
        teacher_out = jax.lax.stop_gradient(teacher_out)

        acc = classwise_acc(
            ulb_state.ulb_list,
            ulb_state.ulb_flag,
            num_labeled_scans,
            pl_cfg.thresh_warmup,
            literal=pl_cfg.literal_reference_cbl,
        )
        pl = get_pseudo_labels(teacher_out, acc, pl_cfg)
        pl_boxes = reproject_boxes(pl.boxes, batch["aug_t"], batch["aug_s"])
        pl_boxes = pl_boxes * pl.valid[..., None]

        # ---- update per-scan pseudo histograms for the unlabeled slots ----
        onehot = jax.nn.one_hot(pl.labels, pl_cfg.num_classes)
        hist = jnp.sum(onehot * pl.valid[..., None], axis=1)  # (B, C)
        idx = batch["ulb_scan_idx"][n_labeled:]
        # if the same scan was drawn twice this step, keep only the last
        # row (XLA scatter-set order is otherwise undefined — the reference
        # iterates in python order, last write wins, votenet_nesie.py:301)
        pos = jnp.arange(idx.shape[0])
        last_pos = (
            jnp.full((ulb_state.ulb_list.shape[0],), -1, pos.dtype)
            .at[idx]
            .max(pos)
        )
        idx_dedup = jnp.where(last_pos[idx] == pos, idx,
                              ulb_state.ulb_list.shape[0])
        new_ulb_list = ulb_state.ulb_list.at[idx_dedup].set(
            hist[n_labeled:], mode="drop"
        )
        new_ulb_flag = ulb_state.ulb_flag.at[idx_dedup].set(0.0, mode="drop")
        new_ulb_state = UlbState(new_ulb_list, new_ulb_flag)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points_s"],
                sample_mod,
                rng_s,
                train=True,
                mutable=["batch_stats"],
            )
            out_sup = _tree_slice(out, 0, n_labeled)
            out_unsup = _tree_slice(out, n_labeled, B)

            sup_targets = get_targets(
                batch["points_s"][:n_labeled, :, :3],
                batch["gt_boxes"][:n_labeled],
                batch["gt_labels"][:n_labeled],
                batch["gt_valid"][:n_labeled],
                out_sup["aggregated_points"],
                pos_distance_thr=pos_distance_thr,
                neg_distance_thr=neg_distance_thr,
                gt_per_seed=loss_cfg.gt_per_seed,
            )
            sup_total, sup_terms = sup_loss_fn(out_sup, sup_targets)

            unsup_targets = get_targets(
                batch["points_s"][n_labeled:, :, :3],
                pl_boxes[n_labeled:],
                pl.labels[n_labeled:],
                pl.valid[n_labeled:],
                out_unsup["aggregated_points"],
                pos_distance_thr=pos_distance_thr,
                neg_distance_thr=neg_distance_thr,
                gt_per_seed=loss_cfg.gt_per_seed,
            )
            unsup_total, unsup_terms = unsup_loss_fn(
                out_unsup, unsup_targets, pl.quality[n_labeled:]
            )
            total = sup_total + unsup_total
            return total, ({**sup_terms, **unsup_terms}, mutated["batch_stats"])

        (total, (terms, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state._replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
        )
        new_state = ema_update(new_state, ema_momentum, ema_warm_up,
                               ema_bn_stats)

        metrics = dict(terms)
        metrics["loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["num_pseudo"] = jnp.sum(pl.valid[n_labeled:])
        return new_state, new_ulb_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
