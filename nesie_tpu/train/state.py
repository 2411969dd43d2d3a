"""Training state and optimizer (reference recipe: AdamW lr 8e-3 wd 0.01,
grad-clip L2 max 10, step LR x0.1 at epochs 24/32 of 36 —
configs/Nesie/nesie-votenet-scannet-train-010.py:129-134).

The EMA teacher (reference SimiTeacherHook, simi_teacher_hook.py) is two
extra pytrees on the state; the reference's in-place parameter swap dance
disappears — the teacher forward just applies ``ema_params``.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    ema_params: Any
    ema_batch_stats: Any
    opt_state: Any


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    milestones: Sequence[int] = (24, 32),
    gamma: float = 0.1,
):
    """Epoch-milestone step decay as an optax schedule."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_cosine_lr_after_step(
    base_lr: float,
    steps_per_epoch: int,
    step_epoch: int,
    total_epochs: int,
    clip: float = 1e-6,
):
    """Constant-then-cosine decay (reference ``cosine_lr_after_step``,
    mmdet3d/models/utils/utils.py:26-34, used by the sparse-conv
    segmentation trainers): lr stays at ``base_lr`` until ``step_epoch``,
    then follows a half cosine down to ``clip`` at ``total_epochs``."""

    def schedule(step):
        epoch = step // steps_per_epoch
        frac = (epoch - step_epoch) / max(total_epochs - step_epoch, 1)
        cos_lr = clip + 0.5 * (base_lr - clip) * (1.0 + jnp.cos(jnp.pi * frac))
        return jnp.where(epoch < step_epoch, base_lr, cos_lr)

    return schedule


def make_optimizer(
    lr_schedule,
    weight_decay: float = 0.01,
    grad_clip_norm: float = 10.0,
):
    """AdamW with global-norm clipping (mmcv OptimizerHook grad_clip)."""
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(
            learning_rate=lr_schedule,
            weight_decay=weight_decay,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
        ),
    )


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # the teacher starts as a *copy* (fresh buffers — donation of the state
    # must not alias params and ema_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        ema_params=jax.tree.map(jnp.copy, params),
        ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
        opt_state=tx.init(params),
    )


def ema_update(state: TrainState, base_momentum: float = 1e-3,
               warm_up: float = 10.0,
               ema_bn_stats: bool = False) -> TrainState:
    """EMA teacher update with the reference's warm-up rule
    (simi_teacher_hook.py:54-64): m_t = min(m, (1 + t) / (warm_up + t)),
    teacher <- (1 - m_t) * teacher + m_t * student.

    By default only *parameters* are EMA'd and BN running stats are shared
    with the student (the reference's param swap never touches non-ema
    buffers), so ``ema_batch_stats`` mirrors the student's.

    ``ema_bn_stats=True`` EMAs the running stats with the same momentum so
    the teacher's normalization lags in lockstep with its parameters.
    tools/diagnose_teacher.py shows why this matters on short horizons:
    when m*N << 1 the teacher's parameters stay far behind the student,
    and the student's current stats only calibrate its own current
    parameters — the lagged-params/current-stats pairing collapses eval
    mAP ~3x (pretrain params + student stats collapse identically, while
    teacher params + matched stats score ABOVE the pretrain baseline).
    The reference never hits this because its real runs have m*N ~ 5,
    where the teacher tracks the recent student and the shared stats are
    approximately matched.
    """
    t = state.step.astype(jnp.float32)
    m = jnp.minimum(base_momentum, (1.0 + t) / (warm_up + t))

    def upd(e, p):
        return (1.0 - m) * e + m * p.astype(e.dtype)

    return state._replace(
        ema_params=jax.tree.map(upd, state.ema_params, state.params),
        ema_batch_stats=(
            jax.tree.map(upd, state.ema_batch_stats, state.batch_stats)
            if ema_bn_stats else state.batch_stats),
    )
