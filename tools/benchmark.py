#!/usr/bin/env python
"""Component & end-to-end benchmark harness.

Examples:
    python tools/benchmark.py --what ops           # point-op timings
    python tools/benchmark.py --what forward       # full model fwd variants
    python tools/benchmark.py --what train         # supervised train step
    python tools/benchmark.py --what decode        # decode + NMS
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _sync(out):
    """True completion barrier: transfer one scalar per call.

    On tunneled backends block_until_ready can return before execution
    finishes and full device_get adds transfer time; reducing to a scalar
    on device and pulling that is both correct and cheap."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(s)


def timeit(name, fn, *args, iters=5, **_ignored):
    _sync(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt * 1000:9.2f} ms", flush=True)
    return dt


def bench_ops(B=8, N=40000):
    import jax, jax.numpy as jnp

    from nesie_tpu.ops import ball_query, furthest_point_sample, three_nn
    from nesie_tpu.ops.pallas_fps import furthest_point_sample_pallas

    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (B, N, 3))
    timeit("fps 40000->2048 (xla)",
           jax.jit(lambda x: furthest_point_sample(x, 2048)), xyz)
    try:
        timeit("fps 40000->2048 (pallas)",
               jax.jit(lambda x: furthest_point_sample_pallas(x, 2048)), xyz)
    except Exception as e:
        print(f"pallas fps unavailable: {type(e).__name__}")
    c = xyz[:, :2048]
    timeit("ball_query 2048q x 40000 K64",
           jax.jit(lambda x, q: ball_query(x, q, 0.2, 64)), xyz, c)
    timeit("ball_query 1024q x 2048 K32",
           jax.jit(lambda x, q: ball_query(x, q, 0.4, 32)), c, xyz[:, :1024])
    grid = jax.random.uniform(key, (B, 49152, 3))
    timeit("three_nn 49152q x 1024 (quality grids)",
           jax.jit(lambda q, s: three_nn(q, s)), grid, xyz[:, :1024])


def bench_forward(B=8, pallas_fps=False, bf16=False, pallas_bq=False):
    import jax, jax.numpy as jnp

    import nesie_tpu.ops.pointops as po
    from nesie_tpu.nn.detector import VoteNetNesie

    if pallas_fps:
        po.set_fps_impl("pallas")
    if pallas_bq:
        po.set_ball_query_impl("pallas")
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, 40000, 4))
    model = VoteNetNesie(compute_dtype="bfloat16" if bf16 else None)
    variables = model.init({"params": key}, pts[:1], "seed", key, train=False)

    @jax.jit
    def fwd(p):
        out = model.apply(variables, p, "seed", jax.random.PRNGKey(1), train=False,
                          with_jitter=False)
        return out["bbox_preds"], out["iou_scores"]

    tag = f"forward (pallas_fps={pallas_fps}, pallas_bq={pallas_bq}, bf16={bf16})"
    dt = timeit(tag, fwd, pts, iters=10, sync_via_transfer=False)
    print(f"  -> {B / dt:.2f} scenes/s", flush=True)


def bench_train(B=2, pallas: bool = True):
    import jax, jax.numpy as jnp

    import nesie_tpu.ops.pointops as po
    from nesie_tpu.nn.detector import VoteNetNesie

    if pallas and jax.default_backend() == "tpu":
        po.set_fps_impl("pallas")
        po.set_ball_query_impl("pallas")
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )
    from nesie_tpu.train.step import make_supervised_train_step

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, 40000, 4))
    model = VoteNetNesie()
    variables = model.init({"params": key}, pts[:1], "vote", key, train=False)
    tx = make_optimizer(make_lr_schedule(8e-3, 100))
    state = create_train_state(variables, tx)
    step = make_supervised_train_step(model, tx)
    batch = dict(
        points=pts,
        gt_boxes=jnp.zeros((B, 64, 7)).at[:, :8, 3:6].set(0.5),
        gt_labels=jnp.zeros((B, 64), jnp.int32),
        gt_valid=jnp.zeros((B, 64), bool).at[:, :8].set(True),
    )

    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["loss"])  # host transfer = true completion barrier
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, m = step(state, batch, jax.random.PRNGKey(2))
        float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"supervised train step (B={B}): {dt*1000:.1f} ms "
          f"({B/dt:.2f} scenes/s)", flush=True)


def bench_semi(n_labeled=4, ratio=2):
    """Full semi-supervised step at the reference's batch shape
    (samples_per_gpu=4, ratio=2 -> 12 scenes/step): student fwd/bwd on
    all scenes, teacher fwd + pseudo-labels, EMA — one XLA program."""
    import jax, jax.numpy as jnp

    from nesie_tpu.data.augment import AugParams
    from nesie_tpu.nn.detector import VoteNetNesie
    from nesie_tpu.train.pseudo_label import PseudoLabelConfig
    from nesie_tpu.train.semi import UlbState, make_semi_train_step
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )

    B = n_labeled * (1 + ratio)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, 40000, 4))
    model = VoteNetNesie()
    variables = model.init({"params": key}, pts[:1], "vote", key, train=False)
    tx = make_optimizer(make_lr_schedule(8e-3, 100))
    state = create_train_state(variables, tx)
    ulb_state = UlbState.create(num_unlabeled=1201, num_classes=18)
    step = make_semi_train_step(
        model, tx, n_labeled=n_labeled, num_labeled_scans=120,
        pl_cfg=PseudoLabelConfig(),
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1), (B, 40000, 4)),
        gt_boxes=jnp.zeros((B, 64, 7)).at[:, :8, 3:6].set(0.5),
        gt_labels=jnp.zeros((B, 64), jnp.int32),
        gt_valid=jnp.zeros((B, 64), bool).at[:, :8].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.arange(B, dtype=jnp.int32) % 1201,
    )
    state, ulb_state, m = step(state, ulb_state, batch, jax.random.PRNGKey(3))
    float(m["loss"])
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, ulb_state, m = step(
            state, ulb_state, batch, jax.random.PRNGKey(4)
        )
        float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"semi train step ({n_labeled}+{n_labeled * ratio} scenes): "
          f"{dt*1000:.1f} ms ({B/dt:.2f} scenes/s)", flush=True)


def bench_decode(B=8):
    import jax, jax.numpy as jnp

    from nesie_tpu.eval.postprocess import decode_and_nms

    key = jax.random.PRNGKey(0)
    P, C = 256, 18
    results = dict(
        bbox_preds=jax.random.uniform(key, (B, P, 7)) * 2,
        obj_scores=jax.random.normal(key, (B, P, 2)),
        sem_scores=jax.random.normal(key, (B, P, C)),
        iou_scores=jax.random.uniform(key, (B, P, C)),
    )
    pts = jax.random.uniform(key, (B, 40000, 3)) * 4
    timeit("decode + class-aware NMS",
           lambda r, p: decode_and_nms(r, p), results, pts, iters=5,
           sync_via_transfer=False)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="forward",
                   choices=["ops", "forward", "train", "semi", "decode", "all"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--pallas-fps", action="store_true")
    p.add_argument("--pallas-bq", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--platform", default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the run into DIR")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.profile:
        import contextlib

        import jax

        prof = jax.profiler.trace(args.profile)
    else:
        import contextlib

        prof = contextlib.nullcontext()
    with prof:
        run(args)


def run(args):
    if args.what in ("ops", "all"):
        bench_ops(args.batch)
    if args.what in ("forward", "all"):
        bench_forward(args.batch, args.pallas_fps, args.bf16, args.pallas_bq)
    if args.what in ("train", "all"):
        bench_train()
    if args.what in ("semi", "all"):
        bench_semi()
    if args.what in ("decode", "all"):
        bench_decode(args.batch)


if __name__ == "__main__":
    main()
