#!/usr/bin/env python
"""A/B the eval-forward and semi-step bench programs under kernel-impl
toggles (fps, three_nn) to attribute throughput deltas. Run SOLO.

    python tools/impl_ab.py --what eval --configs pallas:pallas,pallas:xla
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_eval(batch=32, iters=10):
    from nesie_tpu.nn.detector import VoteNetNesie

    model = VoteNetNesie()
    rng = jax.random.PRNGKey(0)
    points = jax.random.uniform(rng, (batch, 40000, 4), jnp.float32)
    variables = model.init({"params": rng}, points[:1], "seed", rng,
                           train=False)

    @jax.jit
    def forward(pts):
        out = model.apply(variables, pts, "seed", jax.random.PRNGKey(1),
                          train=False, with_jitter=False)
        return jnp.sum(out["bbox_preds"]) + jnp.sum(out["iou_scores"])

    t0 = time.perf_counter()
    float(forward(points))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        float(forward(points))
    dt = (time.perf_counter() - t0) / iters
    return {"ms": round(dt * 1e3, 1),
            "scenes_per_sec": round(batch / dt, 2),
            "compile_s": round(compile_s, 1)}


def time_semi(iters=5):
    from nesie_tpu.data.augment import AugParams
    from nesie_tpu.nn.detector import VoteNetNesie
    from nesie_tpu.train.pseudo_label import PseudoLabelConfig
    from nesie_tpu.train.semi import UlbState, make_semi_train_step
    from nesie_tpu.train.state import (
        create_train_state,
        make_lr_schedule,
        make_optimizer,
    )
    from nesie_tpu.train.sup_loss import NesieLossConfig

    n_labeled, ratio = 4, 2
    B = n_labeled * (1 + ratio)
    model = VoteNetNesie()
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (B, 40000, 4), jnp.float32)
    variables = model.init({"params": key}, pts[:1], "vote", key,
                           train=False)
    tx = make_optimizer(make_lr_schedule(8e-3, 1000))
    state = create_train_state(variables, tx)
    ulb_state = UlbState.create(1201, 18)
    step = make_semi_train_step(
        model, tx, n_labeled=n_labeled, num_labeled_scans=120,
        loss_cfg=NesieLossConfig(), pl_cfg=PseudoLabelConfig(),
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1),
                                        (B, 40000, 4)),
        gt_boxes=jnp.zeros((B, 64, 7)).at[:, :8, 3:6].set(0.6)
        .at[:, :8, :2].set(1.0),
        gt_labels=jnp.zeros((B, 64), jnp.int32),
        gt_valid=jnp.zeros((B, 64), bool).at[:, :8].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.arange(B, dtype=jnp.int32),
    )

    def run(state, ulb_state, k):
        state, ulb_state, metrics = step(state, ulb_state, batch, k)
        float(metrics["loss"])
        return state, ulb_state

    t0 = time.perf_counter()
    state, ulb_state = run(state, ulb_state, key)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        state, ulb_state = run(state, ulb_state, jax.random.PRNGKey(i))
    dt = (time.perf_counter() - t0) / iters
    return {"ms": round(dt * 1e3, 1), "scenes_per_sec": round(B / dt, 2),
            "compile_s": round(compile_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--what", default="eval", choices=["eval", "semi"])
    p.add_argument("--configs", default="pallas:pallas,pallas:xla",
                   help="comma list of fps:three_nn impl pairs")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import nesie_tpu.ops.pointops as po
    from nesie_tpu.utils import enable_compile_cache

    enable_compile_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    po.set_ball_query_impl("pallas")

    results = {}
    for spec in args.configs.split(","):
        fps, tnn = spec.split(":")
        po.set_fps_impl(fps)
        po.set_three_nn_impl(tnn)
        r = (time_eval() if args.what == "eval" else time_semi())
        results[spec] = r
        print(f"{args.what} fps={fps} 3nn={tnn}: {r}", flush=True)
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
