#!/usr/bin/env python
"""Probe the pseudo-label gate against a pretrain checkpoint.

The reference's filter (votenet_nesie.py:152-166) passes a teacher
proposal only when pos_obj > obj_thr AND iou_pred > iou_thr AND
max_cls > cls_thr. Its shipped thresholds (obj 0.9) assume a
fully-trained real-data teacher; on short synthetic pretrains the gate
can pass nothing and the semi loop silently trains labeled-only
(CLAUDE.md / train_semi's zero-pseudo alarm). This tool loads a
validation-study pretrain checkpoint, runs the teacher-style forward
(train-mode BN, weak view) on held-out scenes, and prints the score
distributions plus accepted-pseudo counts over an obj_thr sweep — the
evidence used to pick the study's (disclosed) threshold overrides.

    python tools/probe_thresholds.py --out /tmp/study2 --platform cpu \
        --split 050 [--seed 0]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from validation_run import MID_MODEL  # noqa: E402  (sibling tool)

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/study2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", default="050")
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--pretrain-epochs", type=int, default=12)
    p.add_argument("--pretrain-repeat", type=int, default=2)
    p.add_argument("--head", default="nesie", choices=["nesie", "saqe"])
    p.add_argument("--n-scenes", type=int, default=16)
    p.add_argument("--model-overrides", nargs="*",
                   default=["model.num_proposal=32", "model.reg_max=8"])
    p.add_argument("--platform", default=None)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import ScanNetScenes, SubScanNetScenes
    from nesie_tpu.train import runner
    from nesie_tpu.train.pseudo_label import (
        PseudoLabelConfig,
        get_pseudo_labels,
    )
    from nesie_tpu.utils import enable_compile_cache

    enable_compile_cache()
    root = Path(args.out) / "data"
    model_over = ([f"model.{k}={v}" for k, v in MID_MODEL.items()]
                  + args.model_overrides)

    pcfg = get_config(f"{args.head}-votenet-scannet-pretrain-{args.split}")
    pcfg = apply_overrides(pcfg, model_over + [
        f"data.num_points={args.num_points}",
        f"optim.max_epochs={args.pretrain_epochs}",
        "data.samples_per_step=4",
        f"data.repeat={args.pretrain_repeat}",
        f"checkpoint_interval_epochs={args.pretrain_epochs}",
    ])
    pcfg = dataclasses.replace(
        pcfg, seed=args.seed, num_devices=1,
        work_dir=str(Path(args.out) / f"work_s{args.seed}"),
        name=pcfg.name + f"_s{args.seed}",
    )
    pre_ds = SubScanNetScenes(root, root / pcfg.data.train_ann_file,
                              root / pcfg.data.label_list_file)
    # resume=True with a finished checkpoint loads and skips training
    state = runner.train_supervised(pcfg, pre_ds, resume=True)
    model = runner.build_model(pcfg)

    val_ds = ScanNetScenes(root, root / pcfg.data.val_ann_file)
    rng = np.random.default_rng(7)
    idx = list(range(min(args.n_scenes, len(val_ds))))
    batch = val_ds.eval_batch(idx, rng, args.num_points)

    # teacher-style forward: train-mode BN like the semi step's weak view
    @jax.jit
    def teacher_fwd(params, batch_stats, pts, key):
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, pts,
            pcfg.test.sample_mod, key, train=True, with_jitter=False,
            mutable=["batch_stats"],
        )
        return out

    out = teacher_fwd(state.params, state.batch_stats,
                      jnp.asarray(batch["points"]), jax.random.PRNGKey(0))

    pos_obj = np.asarray(jax.nn.softmax(out["obj_scores"], axis=-1)[..., 1])
    argmax_cls = np.asarray(jnp.argmax(out["sem_scores"], axis=-1))
    iou_pred = np.asarray(jnp.take_along_axis(
        out["iou_scores"], jnp.asarray(argmax_cls)[..., None], axis=-1
    ))[..., 0]
    max_cls = np.asarray(jnp.max(out["sem_scores"], axis=-1))

    def pct(x):
        q = np.percentile(x, [50, 75, 90, 95, 99, 100])
        return " ".join(f"p{p}={v:.3f}" for p, v in
                        zip([50, 75, 90, 95, 99, 100], q))

    print(f"pos_obj : {pct(pos_obj)}")
    print(f"iou_pred: {pct(iou_pred)}")
    print(f"max_cls : {pct(max_cls)}")

    # conditional structure: the three gates are correlated (the same
    # confident proposals should score high on all three) — show the
    # iou/cls distribution *among* the high-objectness proposals, which
    # is what the joint gate actually sees
    hi = pos_obj > np.percentile(pos_obj, 90)
    print(f"among pos_obj>p90: iou_pred {pct(iou_pred[hi])}")
    print(f"among pos_obj>p90: max_cls  {pct(max_cls[hi])}")

    report = {"pos_obj": pct(pos_obj), "iou_pred": pct(iou_pred),
              "max_cls": pct(max_cls), "sweep": {}}
    # thresh_warmup with no visited scans -> acc=0: shipped gate floor is
    # cls 0.7 / iou 0.25; sweep obj_thr (the binding one) + a relaxed pair
    for obj_thr in (0.9, 0.7, 0.5, 0.4, 0.3, 0.2):
        n = {}
        for tag, (cls_b, iou_b) in {"shipped_cls_iou": (0.7, 0.25),
                                    "relaxed_cls_iou": (0.5, 0.10),
                                    "floor_cls_iou": (0.2, 0.05)}.items():
            cfg = PseudoLabelConfig(
                num_classes=pcfg.loss.num_classes,
                max_num_obj=pcfg.pseudo.max_num_obj,
                obj_thr=obj_thr, cls_thr_base=cls_b, iou_thr_base=iou_b,
            )
            pl = get_pseudo_labels(out, jnp.zeros(pcfg.loss.num_classes),
                                    cfg)
            n[tag] = int(np.asarray(pl.valid).sum())
        report["sweep"][obj_thr] = n
        print(f"obj_thr={obj_thr:.1f}: accepted pseudo-labels "
              f"(over {len(idx)} scenes) shipped cls/iou={n['shipped_cls_iou']}"
              f"  relaxed cls/iou={n['relaxed_cls_iou']}")
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
