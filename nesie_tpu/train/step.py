"""Jitted train/eval steps (supervised path; semi-supervised in semi.py)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from .state import TrainState, ema_update
from .sup_loss import NesieLossConfig, nesie_supervised_loss
from .targets import get_targets


def make_supervised_train_step(
    model,
    tx,
    loss_cfg: NesieLossConfig = NesieLossConfig(),
    sample_mod: str = "vote",
    ema_momentum: float = 1e-3,
    ema_warm_up: float = 10.0,
    pos_distance_thr: float = 0.3,
    neg_distance_thr: float = 0.6,
    head: str = "nesie",
    ema_bn_stats: bool = False,
):
    """Build the jitted supervised step.

    Batch layout: dict with points (B, N, C_in), gt_boxes (B, MAX_GT, 7)
    bottom-centered, gt_labels (B, MAX_GT) int32, gt_valid (B, MAX_GT) bool,
    and optionally ``aug`` (AugParams, applied on device to points + GT).
    """
    from nesie_tpu.data.augment import augment_boxes, augment_points

    if head == "saqe":
        from .saqe_loss import SAQELossConfig, saqe_supervised_loss

        saqe_cfg = (
            loss_cfg
            if isinstance(loss_cfg, SAQELossConfig)
            else SAQELossConfig(num_classes=loss_cfg.num_classes)
        )

        def sup_loss_fn(out, targets):
            return saqe_supervised_loss(out, targets, saqe_cfg, phase="pretrain")

    else:

        def sup_loss_fn(out, targets):
            return nesie_supervised_loss(out, targets, loss_cfg)

    def loss_fn(params, batch_stats, batch, rng):
        if "aug" in batch:
            batch = dict(batch)
            batch["points"] = augment_points(
                batch["points"], batch["aug"], shift_height=True
            )
            batch["gt_boxes"] = augment_boxes(batch["gt_boxes"], batch["aug"])
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"],
            sample_mod,
            rng,
            train=True,
            mutable=["batch_stats"],
        )
        targets = get_targets(
            batch["points"][..., :3],
            batch["gt_boxes"],
            batch["gt_labels"],
            batch["gt_valid"],
            out["aggregated_points"],
            pos_distance_thr=pos_distance_thr,
            neg_distance_thr=neg_distance_thr,
            gt_per_seed=loss_cfg.gt_per_seed,
        )
        total, terms = sup_loss_fn(out, targets)
        return total, (terms, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        (total, (terms, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, rng)
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
        return new_state, metrics

    return train_step


# one jitted program per (model, sample_mod): the student and teacher
# forwards are structurally identical (they differ only in which state
# leaves are fed), so sharing the executable halves eval compiles — on
# the remote-compile TPU tunnel each program is 10-40 min.
_EVAL_INNER_CACHE = {}


def make_eval_forward(model, sample_mod: str = "seed", use_teacher: bool = False):
    """Jitted eval forward returning the head results dict.

    Runs the with_jitter=False fast path: numerically identical main
    outputs at eval (running-stat BN), half the quality-module cost."""
    key = (id(model), sample_mod)
    inner = _EVAL_INNER_CACHE.get(key)
    if inner is None:

        @jax.jit
        def inner(params, batch_stats, points, rng):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                points,
                sample_mod,
                rng,
                train=False,
                with_jitter=False,
            )

        _EVAL_INNER_CACHE[key] = inner

    def forward(state: TrainState, points, rng):
        if use_teacher:
            return inner(state.ema_params, state.ema_batch_stats, points, rng)
        return inner(state.params, state.batch_stats, points, rng)

    return forward
