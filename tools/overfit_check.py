#!/usr/bin/env python
"""Synthetic-overfit sanity harness: train the flagship detector on a
handful of generated scenes and report train-set mAP.

The reference validates correctness only through end-metric mAP against
released checkpoints (SURVEY.md §4); with no dataset in this environment
the equivalent smoke signal is "the full train->decode->eval stack can
drive mAP well above chance on scenes it has memorized".

    python tools/overfit_check.py --steps 300 --batch 8 --scenes 16
    python tools/overfit_check.py --platform cpu --tiny   # CI-sized
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--scenes", type=int, default=16)
    p.add_argument("--num-points", type=int, default=40000)
    p.add_argument("--lr", type=float, default=4e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="small model + 4096 points (CPU-sized)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from nesie_tpu.data.dataset import SubScanNetScenes
    from nesie_tpu.data.scannet_meta import CLASS_NAMES
    from nesie_tpu.data.synthetic import make_synthetic_scenes
    from nesie_tpu.eval import decode_and_nms, indoor_eval
    from nesie_tpu.eval.postprocess import expand_per_class
    from nesie_tpu.nn.detector import VoteNetNesie
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )
    from nesie_tpu.train.step import make_eval_forward, make_supervised_train_step

    if args.tiny:
        args.num_points = 4096
        model = VoteNetNesie(
            num_proposal=64,
            num_points=(256, 128, 64, 64),
            sa_channels=((32, 32, 64),) + ((64, 64, 64),) * 3,
            fp_channels=((64, 64), (64, 64)),
        )
    else:
        model = VoteNetNesie()

    scenes = make_synthetic_scenes(args.scenes, seed=args.seed)
    ds = SubScanNetScenes(
        scenes=scenes, labeled_ids=[s.scene_id for s in scenes]
    )

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    dummy = jnp.zeros((1, 1024, 4), jnp.float32)
    variables = model.init({"params": key}, dummy, "vote", key, train=False)
    tx = make_optimizer(make_lr_schedule(args.lr, max(args.steps, 1)))
    state = create_train_state(variables, tx)
    step = make_supervised_train_step(model, tx)

    t0 = time.time()
    for i in range(args.steps):
        idx = rng.choice(len(ds), size=args.batch, replace=True)
        batch = ds.eval_batch(list(idx), rng, args.num_points)
        batch.pop("scene_ids")
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i:4d}  loss {float(m['loss']):8.3f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)

    fwd = make_eval_forward(model, "seed")
    gt_annos, dt_annos = [], []
    for start in range(0, len(ds), args.batch):
        idx = list(range(start, min(start + args.batch, len(ds))))
        n_real = len(idx)
        idx = idx + [idx[-1]] * (args.batch - n_real)
        batch = ds.eval_batch(idx, rng, args.num_points)
        key, sub = jax.random.split(key)
        out = fwd(state, jnp.asarray(batch["points"]), sub)
        decoded = jax.tree.map(np.asarray, decode_and_nms(
            out, jnp.asarray(batch["points"])
        ))
        for b in range(n_real):
            boxes, scores, labels = expand_per_class(
                {k: v[b] for k, v in decoded.items()}
            )
            dt_annos.append(dict(boxes=boxes, scores=scores, labels=labels))
            gb = batch["gt_boxes"][b][batch["gt_valid"][b]].copy()
            gb[:, 2] += gb[:, 5] / 2
            gt_annos.append(
                dict(boxes=gb,
                     labels=batch["gt_labels"][b][batch["gt_valid"][b]])
            )

    results = indoor_eval(gt_annos, dt_annos, class_names=list(CLASS_NAMES))
    for k in sorted(results):
        if k.startswith("mAP") or k.startswith("mAR"):
            print(f"{k}: {results[k]:.4f}")
    # a floor, not a target: random predictions score ~0.00; the tiny
    # 300-step CPU config lands ~0.19 with recall 0.77 and still-falling
    # loss, the flagship TPU config should clear it comfortably
    assert results["mAP_0.25"] > 0.15, (
        "overfit sanity failed: the stack should memorize "
        f"{args.scenes} scenes (mAP@0.25 = {results['mAP_0.25']:.3f})"
    )
    print("overfit check PASSED")


if __name__ == "__main__":
    main()
