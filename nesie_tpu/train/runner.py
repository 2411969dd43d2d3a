"""Training runner: epoch loop, logging, orbax checkpointing.

Replaces the reference's mmcv EpochBasedRunner / SimiEpochBasedRunner
(mmdet3d/runner/simi_epoch_based_runner.py) + hook machinery with a plain
loop around jitted steps. Checkpoints hold the full TrainState pytree
(params + ema teacher + optimizer + step), the JAX equivalent of the
reference's paired ``epoch_N.pth`` / ``epoch_N_ema.pth`` files.
"""
from __future__ import annotations

import json
import logging
import time
from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from nesie_tpu.config import ExperimentConfig
from nesie_tpu.data.dataset import AugConfig, SimiScanNetScenes, SubScanNetScenes
from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.parallel import (
    make_mesh,
    process_local_rows,
    replicate,
    shard_host_batch,
)
from nesie_tpu.train.semi import UlbState, make_semi_train_step
from nesie_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from nesie_tpu.train.step import make_supervised_train_step

log = logging.getLogger("nesie_tpu")


# All builders below are memoized on the frozen config dataclasses: a
# repeated (config, steps_per_epoch) signature returns the SAME model /
# optimizer / jitted-step objects, so multi-seed or multi-variant studies
# (tools/validation_run.py) reuse jit's in-memory executable cache instead
# of retracing — on the remote-compile TPU tunnel every structurally
# identical recompile would otherwise cost 10-40 min.


def build_model(cfg: ExperimentConfig) -> VoteNetNesie:
    return _build_model(cfg.model)


@lru_cache(maxsize=None)
def _build_model(m) -> VoteNetNesie:
    return VoteNetNesie(
        num_classes=m.num_classes,
        reg_max=m.reg_max,
        num_proposal=m.num_proposal,
        in_channels=m.in_channels,
        dataset_name=m.dataset_name,
        sizes=tuple(m.sizes),
        num_points=tuple(m.num_points),
        radii=tuple(m.radii),
        num_samples=tuple(m.num_samples),
        sa_channels=tuple(map(tuple, m.sa_channels)),
        fp_channels=tuple(map(tuple, m.fp_channels)),
        jitter_scale=m.jitter_scale,
        jitter_size_bias=m.jitter_size_bias,
        head=m.head,
        compute_dtype=m.compute_dtype,
    )


def strong_aug_config(cfg: ExperimentConfig) -> AugConfig:
    return AugConfig(
        rot_range=cfg.data.aug_rot_range,
        scale_range=tuple(cfg.data.aug_scale_range),
        translation_std=cfg.data.aug_translation_std,
    )


@lru_cache(maxsize=None)
def _make_tx(optim, steps_per_epoch: int):
    lr = make_lr_schedule(
        optim.lr, steps_per_epoch, optim.lr_milestones, optim.lr_gamma
    )
    return make_optimizer(lr, optim.weight_decay, optim.grad_clip_norm)


def init_state(cfg: ExperimentConfig, model, steps_per_epoch: int):
    rng = jax.random.PRNGKey(cfg.seed)
    n_in = cfg.model.in_channels
    dummy = jax.random.uniform(rng, (1, 1024, n_in), jnp.float32)
    variables = model.init({"params": rng}, dummy, "vote", rng, train=False)
    tx = _make_tx(cfg.optim, steps_per_epoch)
    return create_train_state(variables, tx), tx


@lru_cache(maxsize=None)
def _sup_step_fn(model_cfg, optim, steps_per_epoch, loss_cfg, sample_mod,
                 ema_momentum, ema_warm_up, pos_thr, neg_thr, ema_bn_stats):
    return make_supervised_train_step(
        _build_model(model_cfg),
        _make_tx(optim, steps_per_epoch),
        loss_cfg,
        sample_mod,
        ema_momentum,
        ema_warm_up,
        pos_thr,
        neg_thr,
        head=model_cfg.head,
        ema_bn_stats=ema_bn_stats,
    )


@lru_cache(maxsize=None)
def _semi_step_fn(model_cfg, optim, steps_per_epoch, n_labeled,
                  num_labeled_scans, loss_cfg, pl_cfg, sample_mod,
                  ema_momentum, ema_warm_up, un_label_weight, pos_thr,
                  neg_thr, teacher_jitter, ema_bn_stats):
    return make_semi_train_step(
        _build_model(model_cfg),
        _make_tx(optim, steps_per_epoch),
        n_labeled=n_labeled,
        num_labeled_scans=num_labeled_scans,
        loss_cfg=loss_cfg,
        pl_cfg=pl_cfg,
        sample_mod=sample_mod,
        ema_momentum=ema_momentum,
        ema_warm_up=ema_warm_up,
        un_label_weight=un_label_weight,
        pos_distance_thr=pos_thr,
        neg_distance_thr=neg_thr,
        head=model_cfg.head,
        teacher_jitter=teacher_jitter,
        ema_bn_stats=ema_bn_stats,
    )


class CheckpointManager:
    """state and ulb_state ride as separate composite items so eval /
    weights-only loads can restore just the TrainState from a semi
    checkpoint (the reference's epoch_{n}.pth vs epoch_{n}_ema.pth split
    collapses into one step dir — the teacher lives inside TrainState)."""

    def __init__(self, work_dir, max_to_keep: int = 3):
        path = Path(work_dir).absolute() / "checkpoints"
        self.mgr = ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, state, ulb_state=None, meta: dict | None = None):
        items = {"state": ocp.args.StandardSave(state)}
        if ulb_state is not None:
            items["ulb_state"] = ocp.args.StandardSave(ulb_state)
        if meta is not None:
            items["meta"] = ocp.args.JsonSave(meta)
        self.mgr.save(step, args=ocp.args.Composite(**items))
        self.mgr.wait_until_finished()

    def restore(self, state, ulb_state=None, step=None, mesh_size=None):
        """Restore latest (or ``step``). When ``mesh_size`` is given and the
        checkpoint was written under a different device count, the step
        counter is rescaled so the epoch position is preserved (reference
        simi_epoch_based_runner.py:220-231)."""
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return state, ulb_state, 0
        items = {"state": ocp.args.StandardRestore(state)}
        if ulb_state is not None:
            items["ulb_state"] = ocp.args.StandardRestore(ulb_state)
        meta = {}
        try:
            restored = self.mgr.restore(step, args=ocp.args.Composite(**items))
            try:
                meta = self.mgr.restore(
                    step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
                )["meta"] or {}
            except Exception:
                meta = {}
        except (KeyError, ValueError, FileNotFoundError):
            # legacy layout: one 'default' item holding the payload dict
            target = {"state": state}
            if ulb_state is not None:
                target["ulb_state"] = ulb_state
            restored = self.mgr.restore(
                step, args=ocp.args.StandardRestore(target)
            )
        new_state = restored["state"]
        old_size = meta.get("mesh_size")
        if mesh_size and old_size and old_size != mesh_size:
            rescaled = int(step * old_size / mesh_size)
            log.info(
                "device count changed %d -> %d: rescaling resume step %d -> %d",
                old_size, mesh_size, step, rescaled,
            )
            new_state = new_state._replace(
                step=jnp.asarray(rescaled, new_state.step.dtype)
            )
            step = rescaled
        return new_state, restored.get("ulb_state", ulb_state), step


def weights_only_load(fresh_state, loaded_state):
    """--load-from semantics (reference train.py load_from vs resume_from):
    carry params/BN over, keep the fresh step counter and optimizer state
    so the new phase starts at epoch 0. The EMA teacher starts as a CLONE
    of the loaded student — the reference's SimiTeacherHook registers ema
    buffers from the live parameters (simi_teacher_hook.py:47-52); its
    pretrain checkpoints carry no EMA at all. (Resume restores the trained
    teacher instead.)

    Every leaf is deep-copied: the jitted train steps DONATE their state
    buffers, so handing ``loaded_state``'s arrays over directly would let
    the first training phase delete them out from under any later use of
    the loaded state (e.g. a second semi arm reusing one pretrain in
    tools/validation_run.py)."""
    return fresh_state._replace(
        params=jax.tree.map(jnp.copy, loaded_state.params),
        batch_stats=jax.tree.map(jnp.copy, loaded_state.batch_stats),
        ema_params=jax.tree.map(jnp.copy, loaded_state.params),
        ema_batch_stats=jax.tree.map(jnp.copy, loaded_state.batch_stats),
    )


def _log_metrics(step, epoch, metrics, t_step):
    if jax.process_index() != 0:  # reference @master_only logging
        return
    vals = {k: float(v) for k, v in metrics.items()}
    msg = ", ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items()))
    log.info("epoch %d step %d (%.2fs/it): %s", epoch, step, t_step, msg)


def train_supervised(cfg: ExperimentConfig, dataset: SubScanNetScenes,
                     load_state=None, resume: bool = False,
                     epoch_callback=None):
    """Supervised pretrain loop (reference VoteNet phase, votenet.py:27).

    Runs data-parallel over a 1-D device mesh: state replicated, batches
    sharded on the leading axis (gradient all-reduce is implicit in jit's
    SPMD partitioning — the reference's DDP, train.py:131-139). The global
    batch is ``samples_per_step * mesh.size``; in multi-process runs each
    process loads only its contiguous slice of it.
    """
    from nesie_tpu.utils import MetricsLogger, collect_env

    mesh = make_mesh(cfg.num_devices)
    bs = cfg.data.samples_per_step * mesh.size  # global batch
    lo, hi = process_local_rows(bs)
    n = len(dataset)
    steps_per_epoch = max(n * cfg.data.repeat // bs, 1)
    model = build_model(cfg)
    state, tx = init_state(cfg, model, steps_per_epoch)
    if load_state is not None:
        state = load_state
    step_fn = _sup_step_fn(
        cfg.model,
        cfg.optim,
        steps_per_epoch,
        cfg.loss,
        cfg.sample_mod_train,
        cfg.ema_momentum,
        cfg.ema_warm_up,
        cfg.pos_distance_thr,
        cfg.neg_distance_thr,
        cfg.ema_bn_stats,
    )
    work = Path(cfg.work_dir) / cfg.name
    ckpt = CheckpointManager(work)
    if resume:
        state, _, at = ckpt.restore(state, mesh_size=mesh.size)
        log.info("resumed from step %d", at)
    state = replicate(state, mesh)
    mlog = MetricsLogger(work)
    log.info("env: %s", collect_env())
    log.info("mesh: %d devices, %d processes, global batch %d",
             mesh.size, jax.process_count(), bs)
    # shared stream for the scene order (identical on every process),
    # process-local stream for point subsampling + augmentation draws
    order_rng = np.random.default_rng(cfg.seed)
    rng = np.random.default_rng([cfg.seed, jax.process_index()])
    key = jax.random.PRNGKey(cfg.seed)

    from nesie_tpu.data.prefetch import Prefetcher

    def epoch_batches(order):
        for it in range(steps_per_epoch):
            idx = order[it * bs : (it + 1) * bs]
            if len(idx) < bs:
                return
            batch = dataset.train_batch(
                idx[lo:hi], rng, aug_cfg=strong_aug_config(cfg),
                num_points=cfg.data.num_points,
            )
            batch.pop("scene_ids", None)
            yield shard_host_batch(batch, mesh)

    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, cfg.optim.max_epochs):
        order = np.concatenate(
            [order_rng.permutation(n) for _ in range(cfg.data.repeat)]
        )
        for it, batch in enumerate(Prefetcher(epoch_batches(order))):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, metrics = step_fn(state, batch, sub)
            if it % cfg.log_interval == 0:
                jax.block_until_ready(metrics["loss"])
                _log_metrics(int(state.step), epoch, metrics,
                             time.perf_counter() - t0)
                mlog.log(int(state.step), metrics)
        if (epoch + 1) % cfg.checkpoint_interval_epochs == 0:
            ckpt.save(int(state.step), state,
                      meta={"mesh_size": mesh.size})
        if epoch_callback is not None:
            epoch_callback(epoch, state)
    mlog.close()
    return state


def train_semi(cfg: ExperimentConfig, dataset: SimiScanNetScenes,
               load_state=None, resume: bool = False,
               epoch_callback=None, run_stats: dict | None = None):
    """Semi-supervised loop (reference SimiEpochBasedRunner +
    VoteNetNesie.forward_train), data-parallel over a 1-D device mesh.

    Global batch layout is [labeled x bs_global; unlabeled x ratio*bs_global]
    sharded on the leading axis; each process loads its contiguous row
    slice of it (labeled rows come from the shared scene order, unlabeled
    rows are process-local random draws).

    ``run_stats`` (optional dict) is filled with per-epoch pseudo-label
    production: ``num_pseudo_per_step`` (one mean per epoch) and the overall
    ``num_pseudo_mean``. A whole epoch with ZERO accepted pseudo-labels
    means the teacher-student mechanism silently degenerated to
    labeled-only training (the reference has no guard for this either —
    its thresholds assume a fully-trained pretrain); the runner logs a
    WARNING so it is visible in the logs and in studies."""
    from nesie_tpu.utils import MetricsLogger, collect_env

    mesh = make_mesh(cfg.num_devices)
    bs = cfg.data.samples_per_step * mesh.size  # global labeled batch
    B = bs * (1 + dataset.ratio)
    lo, hi = process_local_rows(B)
    n = dataset.num_labeled
    steps_per_epoch = max(n * cfg.data.repeat // bs, 1)
    model = build_model(cfg)
    state, tx = init_state(cfg, model, steps_per_epoch)
    if load_state is not None:
        state = load_state
    step_fn = _semi_step_fn(
        cfg.model,
        cfg.optim,
        steps_per_epoch,
        bs,
        dataset.num_labeled,
        cfg.loss,
        cfg.pseudo,
        cfg.sample_mod_train,
        cfg.ema_momentum,
        cfg.ema_warm_up,
        cfg.un_label_weight,
        cfg.pos_distance_thr,
        cfg.neg_distance_thr,
        cfg.teacher_jitter,
        cfg.ema_bn_stats,
    )
    ulb_state = UlbState.create(dataset.num_unlabeled, cfg.model.num_classes)
    work = Path(cfg.work_dir) / cfg.name
    ckpt = CheckpointManager(work)
    if resume:
        state, ulb_state, at = ckpt.restore(state, ulb_state,
                                             mesh_size=mesh.size)
        log.info("resumed from step %d", at)
    state = replicate(state, mesh)
    ulb_state = replicate(ulb_state, mesh)
    mlog = MetricsLogger(work)
    log.info("env: %s", collect_env())
    log.info("mesh: %d devices, %d processes, global batch %d+%d",
             mesh.size, jax.process_count(), bs, B - bs)
    order_rng = np.random.default_rng(cfg.seed)
    rng = np.random.default_rng([cfg.seed, jax.process_index()])
    key = jax.random.PRNGKey(cfg.seed)

    from nesie_tpu.data.prefetch import Prefetcher

    def epoch_batches(order):
        for it in range(steps_per_epoch):
            idx = order[it * bs : (it + 1) * bs]
            if len(idx) < bs:
                return
            # rows [lo, hi) of the global [labeled; unlabeled] batch
            local_labeled = idx[lo:min(hi, bs)] if lo < bs else idx[:0]
            batch = dataset.semi_batch(
                local_labeled, rng, strong_cfg=strong_aug_config(cfg),
                num_points=cfg.data.num_points,
                n_unlabeled=(hi - lo) - len(local_labeled),
            )
            yield shard_host_batch(batch, mesh)

    start_epoch = int(state.step) // steps_per_epoch
    pseudo_means = [] if run_stats is None else run_stats.setdefault(
        "num_pseudo_per_step", [])
    for epoch in range(start_epoch, cfg.optim.max_epochs):
        order = np.concatenate(
            [order_rng.permutation(n) for _ in range(cfg.data.repeat)]
        )
        # device-side accumulator: no per-step host sync, one pull per epoch
        ep_pseudo, ep_steps = jnp.zeros(()), 0
        for it, batch in enumerate(Prefetcher(epoch_batches(order))):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, ulb_state, metrics = step_fn(state, ulb_state, batch, sub)
            ep_pseudo = ep_pseudo + metrics["num_pseudo"]
            ep_steps += 1
            if it % cfg.log_interval == 0:
                jax.block_until_ready(metrics["loss"])
                _log_metrics(int(state.step), epoch, metrics,
                             time.perf_counter() - t0)
                mlog.log(int(state.step), metrics)
        total_pseudo = float(ep_pseudo)
        mean_pseudo = total_pseudo / max(ep_steps, 1)
        pseudo_means.append(mean_pseudo)
        mlog.log(int(state.step), {"epoch_num_pseudo_mean": mean_pseudo})
        if total_pseudo == 0.0 and jax.process_index() == 0:
            log.warning(
                "epoch %d produced ZERO pseudo-labels across %d steps — the "
                "semi-supervised loop is training labeled-only (teacher not "
                "confident enough for the pseudo.* thresholds; see "
                "CLAUDE.md / PARITY_RESULTS.md on threshold regimes)",
                epoch, ep_steps,
            )
        if (epoch + 1) % cfg.checkpoint_interval_epochs == 0:
            ckpt.save(int(state.step), state, ulb_state,
                      meta={"mesh_size": mesh.size})
        if epoch_callback is not None:
            epoch_callback(epoch, state)
    if run_stats is not None and pseudo_means:
        run_stats["num_pseudo_mean"] = float(np.mean(pseudo_means))
    mlog.close()
    return state
