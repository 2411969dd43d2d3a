#!/usr/bin/env python
"""Stage-by-stage timing of the semi-supervised train step (VERDICT round-1
item 4): teacher forward / pseudo-labels / targets / student forward /
forward+backward / optimizer, each jitted and synced separately, at the
reference batch shape (4 labeled + 8 unlabeled, 40k points).

The sum of stages exceeds the fused step time (the full step overlaps and
de-duplicates work); the value is the RELATIVE ranking, which tells us
where the 441 ms goes.

    python tools/profile_semi.py [--platform cpu] [--points 40000] [--trace DIR]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--points", type=int, default=40000)
    p.add_argument("--labeled", type=int, default=4)
    p.add_argument("--ratio", type=int, default=2)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace", default=None,
                   help="also write a jax.profiler trace of one full step")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import nesie_tpu.ops.pointops as pointops
    from nesie_tpu.data.augment import AugParams, augment_points, reproject_boxes
    from nesie_tpu.nn.detector import VoteNetNesie
    from nesie_tpu.train.pseudo_label import (
        PseudoLabelConfig,
        classwise_acc,
        get_pseudo_labels,
    )
    from nesie_tpu.train.semi import UlbState, make_semi_train_step
    from nesie_tpu.train.state import (
        create_train_state,
        make_lr_schedule,
        make_optimizer,
    )
    from nesie_tpu.train.sup_loss import NesieLossConfig, nesie_supervised_loss
    from nesie_tpu.train.targets import get_targets

    if jax.default_backend() == "tpu":
        pointops.set_fps_impl("pallas")
        pointops.set_ball_query_impl("pallas")

    n_labeled, ratio, N = args.labeled, args.ratio, args.points
    B = n_labeled * (1 + ratio)
    model = VoteNetNesie()
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, N, 4), jnp.float32)
    variables = model.init({"params": key}, pts[:1], "vote", key, train=False)
    tx = make_optimizer(make_lr_schedule(8e-3, 1000))
    state = create_train_state(variables, tx)
    ulb_state = UlbState.create(1201, 18)
    loss_cfg = NesieLossConfig()
    pl_cfg = PseudoLabelConfig()

    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1), (B, N, 4)),
        gt_boxes=jnp.zeros((B, 64, 7)).at[:, :8, 3:6].set(0.6)
        .at[:, :8, :2].set(1.0),
        gt_labels=jnp.zeros((B, 64), jnp.int32),
        gt_valid=jnp.zeros((B, 64), bool).at[:, :8].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.arange(B, dtype=jnp.int32),
    )
    points_s = augment_points(batch["points_raw_s"], batch["aug_s"],
                              shift_height=True)
    points_t = augment_points(batch["points_raw_t"], batch["aug_t"],
                              shift_height=True)

    def timed(name, fn, *fargs):
        out = fn(*fargs)  # compile
        jax.block_until_ready(out)
        # pull one scalar to host: tunneled backends need a real transfer
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:40s} {dt:8.1f} ms", flush=True)
        return out

    # 1. teacher forward (train-mode BN, like the step)
    @jax.jit
    def teacher_fwd(state, pts_t):
        out, _ = model.apply(
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            pts_t, "vote", jax.random.PRNGKey(3), train=True,
            mutable=["batch_stats"],
        )
        return out

    teacher_out = timed("teacher forward (B=12)", teacher_fwd, state, points_t)

    # 2. pseudo labels + reprojection
    @jax.jit
    def pseudo(teacher_out, ulb_state, aug_t, aug_s):
        acc = classwise_acc(ulb_state.ulb_list, ulb_state.ulb_flag, 120,
                            pl_cfg.thresh_warmup)
        pl = get_pseudo_labels(teacher_out, acc, pl_cfg)
        boxes = reproject_boxes(pl.boxes, aug_t, aug_s)
        return boxes, pl.labels, pl.valid, pl.quality

    pl_out = timed("pseudo labels + reproject", pseudo, teacher_out,
                   ulb_state, batch["aug_t"], batch["aug_s"])

    # 3. student forward only
    @jax.jit
    def student_fwd(state, pts_s):
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pts_s, "vote", jax.random.PRNGKey(4), train=True,
            mutable=["batch_stats"],
        )
        return out

    student_out = timed("student forward (B=12)", student_fwd, state, points_s)

    # 4. targets (sup slice shape, using student aggregated points)
    agg = student_out["aggregated_points"]

    @jax.jit
    def targets_fn(pts_s, gt_boxes, gt_labels, gt_valid, agg):
        return get_targets(pts_s[..., :3], gt_boxes, gt_labels, gt_valid, agg)

    timed("targets (points_in_boxes+chamfer)", targets_fn, points_s,
          batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"], agg)

    # 5. supervised loss on the forward outputs (cheap, for completeness)
    tgts = targets_fn(points_s, batch["gt_boxes"], batch["gt_labels"],
                      batch["gt_valid"], agg)

    @jax.jit
    def loss_only(out, tgts):
        return nesie_supervised_loss(out, tgts, loss_cfg)[0]

    timed("loss terms (given outputs)", loss_only, student_out, tgts)

    # 6. student forward+backward (grad wrt params)
    @jax.jit
    def fwd_bwd(state, pts_s, gt_boxes, gt_labels, gt_valid):
        def lf(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts_s, "vote", jax.random.PRNGKey(4), train=True,
                mutable=["batch_stats"],
            )
            t = get_targets(pts_s[..., :3], gt_boxes, gt_labels, gt_valid,
                            out["aggregated_points"])
            return nesie_supervised_loss(out, t, loss_cfg)[0]

        return jax.grad(lf)(state.params)

    timed("student fwd+bwd (B=12, sup loss)", fwd_bwd, state, points_s,
          batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])

    # 7. the full fused semi step
    step = make_semi_train_step(
        model, tx, n_labeled=n_labeled, num_labeled_scans=120,
        loss_cfg=loss_cfg, pl_cfg=pl_cfg,
    )

    # the step donates state/ulb_state, so thread them through the loop
    s, u = state, ulb_state
    s, u, m = step(s, u, batch, jax.random.PRNGKey(7))  # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        s, u, m = step(s, u, batch, jax.random.PRNGKey(8 + i))
        float(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters * 1000
    print(f"{'FULL semi step (fused)':40s} {dt:8.1f} ms", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            s, u, m = step(s, u, batch, jax.random.PRNGKey(99))
            float(m["loss"])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
