#!/usr/bin/env python
"""Full-pipeline accuracy validation on a generated dataset.

Runs the reference's complete training protocol — supervised pretrain on
the labeled split, then semi-supervised teacher-student training over the
full unlabeled pool (SURVEY.md §3.1/§3.2) — through the PRODUCTION runner
and data path (on-disk .bin/.pkl files), and evaluates held-out mAP for:

    * the pretrain checkpoint (labeled-only baseline),
    * the semi student,
    * the semi EMA teacher.

With no real ScanNet data or released reference checkpoints available in
this environment, this is the accuracy-parity signal (VERDICT.md round-1
item 3b): the semi machinery must beat the labeled-only baseline on scenes
the model has never seen, mirroring the reference's headline claim. The
result is written to PARITY_RESULTS.md.

    python tools/validation_run.py --out /tmp/validation --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MID_MODEL = dict(
    num_proposal=64,
    reg_max=16,
    num_points=(256, 128, 64, 64),
    num_samples=(32, 16, 8, 8),
    sa_channels=((32, 32, 64), (64, 64, 64), (64, 64, 64), (64, 64, 64)),
    fp_channels=((64, 64), (64, 64)),
)


_FWD_CACHE = {}


def eval_mAP(cfg, model, state, ds, num_points, batch=8, use_teacher=False,
             seed=9):
    import jax
    import jax.numpy as jnp

    from nesie_tpu.data.scannet_meta import CLASS_NAMES
    from nesie_tpu.eval import decode_and_nms, indoor_eval
    from nesie_tpu.eval.postprocess import expand_per_class
    from nesie_tpu.train.step import make_eval_forward

    # cache the jitted forward across calls (per-epoch curves would
    # otherwise recompile an identical program every evaluation)
    fwd_key = (id(model), cfg.test.sample_mod, use_teacher)
    fwd = _FWD_CACHE.get(fwd_key)
    if fwd is None:
        fwd = make_eval_forward(model, cfg.test.sample_mod,
                                use_teacher=use_teacher)
        _FWD_CACHE[fwd_key] = fwd
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    gt_annos, dt_annos = [], []
    n = len(ds)
    for start in range(0, n, batch):
        idx = list(range(start, min(start + batch, n)))
        n_real = len(idx)
        idx = idx + [idx[-1]] * (batch - n_real)
        b = ds.eval_batch(idx, rng, num_points)
        key, sub = jax.random.split(key)
        out = fwd(state, jnp.asarray(b["points"]), sub)
        import jax as _jax

        decoded = _jax.tree.map(np.asarray, decode_and_nms(
            out, jnp.asarray(b["points"]),
            nms_thr=cfg.test.nms_thr, score_thr=cfg.test.score_thr,
            use_iou_for_nms=cfg.test.use_iou_for_nms,
        ))
        for i in range(n_real):
            boxes, scores, labels = expand_per_class(
                {k: v[i] for k, v in decoded.items()}
            )
            dt_annos.append(dict(boxes=boxes, scores=scores, labels=labels))
            gb = b["gt_boxes"][i][b["gt_valid"][i]].copy()
            gb[:, 2] += gb[:, 5] / 2
            gt_annos.append(dict(boxes=gb,
                                 labels=b["gt_labels"][i][b["gt_valid"][i]]))
    res = indoor_eval(gt_annos, dt_annos, class_names=list(CLASS_NAMES))
    return {k: float(v) for k, v in res.items()
            if k.startswith("mAP") or k.startswith("mAR")}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/validation")
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--n-val", type=int, default=32)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--pretrain-epochs", type=int, default=10)
    p.add_argument("--semi-epochs", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--report", default="PARITY_RESULTS.md",
                   help="markdown report path (relative to repo root)")
    p.add_argument("--semi-overrides", nargs="*", default=[],
                   help="extra cfg overrides for the semi phase only, e.g. "
                        "pseudo.obj_thr=0.7 (the reference thresholds assume "
                        "a strong real-data pretrain)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import (
        ScanNetScenes,
        SimiScanNetScenes,
        SubScanNetScenes,
    )
    from nesie_tpu.data.synthetic import write_synthetic_scannet
    from nesie_tpu.train import runner

    out = Path(args.out)
    t_start = time.time()

    # ---- dataset on disk, through the real prep/infos path ----
    root = out / "data"
    if not (root / "scannet_infos_train.pkl").exists():
        write_synthetic_scannet(root, args.n_train, args.n_val,
                                seed=args.seed)
    logging.info("dataset at %s (%d train / %d val)", root, args.n_train,
                 args.n_val)

    model_over = [f"model.{k}={v}" for k, v in MID_MODEL.items()]
    common_over = [
        f"data.num_points={args.num_points}",
        "log_interval=10",
    ]

    # ---- phase 1: supervised pretrain on the 10% labeled split ----
    pcfg = get_config("nesie-votenet-scannet-pretrain-010")
    pcfg = apply_overrides(pcfg, model_over + common_over + [
        f"optim.max_epochs={args.pretrain_epochs}",
        f"optim.lr_milestones=({int(args.pretrain_epochs*0.7)},"
        f"{int(args.pretrain_epochs*0.9)})",
        "data.samples_per_step=4",
        "data.repeat=10",
        # checkpoint once at the end so semi-phase reruns skip the pretrain
        f"checkpoint_interval_epochs={args.pretrain_epochs}",
    ])
    pcfg = dataclasses.replace(pcfg, seed=args.seed, num_devices=1,
                               work_dir=str(out / "work"))
    pre_ds = SubScanNetScenes(root, root / pcfg.data.train_ann_file,
                              root / pcfg.data.label_list_file)
    logging.info("pretrain: %d labeled scenes", len(pre_ds))
    model = runner.build_model(pcfg)
    t0 = time.time()
    pre_state = runner.train_supervised(pcfg, pre_ds, resume=True)
    t_pre = time.time() - t0

    val_ds = ScanNetScenes(root, root / pcfg.data.val_ann_file)
    pre_map = eval_mAP(pcfg, model, pre_state, val_ds, args.num_points)
    logging.info("pretrain val: %s", pre_map)

    # ---- phase 2: semi-supervised training over the unlabeled pool ----
    scfg = get_config("nesie-votenet-scannet-train-010")
    scfg = apply_overrides(scfg, model_over + common_over + [
        f"optim.max_epochs={args.semi_epochs}",
        f"optim.lr_milestones=({int(args.semi_epochs*0.7)},"
        f"{int(args.semi_epochs*0.9)})",
        "optim.lr=0.004",
        "data.samples_per_step=2",
        "data.repeat=10",
        "checkpoint_interval_epochs=1000",  # semi variants always retrain
    ] + args.semi_overrides)
    scfg = dataclasses.replace(scfg, seed=args.seed, num_devices=1,
                               work_dir=str(out / "work"))
    semi_ds = SimiScanNetScenes(root, root / scfg.data.train_ann_file,
                                root / scfg.data.label_list_file,
                                ratio=scfg.data.unlabeled_ratio)
    logging.info("semi: %d labeled / %d unlabeled scenes",
                 semi_ds.num_labeled, semi_ds.num_unlabeled)
    fresh, _ = runner.init_state(scfg, model, steps_per_epoch=1)
    load_state = runner.weights_only_load(fresh, pre_state)
    t0 = time.time()
    semi_state = runner.train_semi(scfg, semi_ds, load_state)
    t_semi = time.time() - t0

    student_map = eval_mAP(scfg, model, semi_state, val_ds, args.num_points)
    teacher_map = eval_mAP(scfg, model, semi_state, val_ds, args.num_points,
                           use_teacher=True)
    logging.info("semi student val: %s", student_map)
    logging.info("semi teacher val: %s", teacher_map)

    # ---- report ----
    import jax

    rows = [
        ("pretrain (labeled 10% only)", pre_map),
        ("semi student", student_map),
        ("semi EMA teacher", teacher_map),
    ]
    report = Path(__file__).resolve().parent.parent / args.report
    lines = [
        "# PARITY_RESULTS — full-pipeline accuracy validation",
        "",
        "Held-out mAP from the complete pretrain -> semi-supervised ->",
        "eval pipeline run through the production runner and on-disk data",
        "path (`tools/validation_run.py`). No real ScanNet data or released",
        "reference checkpoints exist in this environment (zero egress), so",
        "the dataset is procedurally generated multi-class indoor scenes",
        "with learnable per-class geometry — the parity signal is that the",
        "semi-supervised machinery (EMA teacher, class-balanced pseudo-label",
        "filtering, quality-weighted unsup losses, aug re-projection) beats",
        "the labeled-only baseline on unseen scenes, mirroring the",
        "reference's headline result structure (BASELINE.md).",
        "",
        f"Setup: {args.n_train} train scenes ({len(pre_ds)} labeled, 10% "
        f"split file), {args.n_val} held-out val scenes, "
        f"{args.num_points} points/scene, mid-size model "
        f"(64 proposals, SA {MID_MODEL['num_points']}), "
        f"pretrain {args.pretrain_epochs} epochs + semi {args.semi_epochs} "
        f"epochs, seed {args.seed}, platform "
        f"{jax.devices()[0].platform}.",
        "",
        "| model | mAP@0.25 | mAP@0.50 | mAR@0.25 | mAR@0.50 |",
        "|---|---|---|---|---|",
    ]
    for name, m in rows:
        lines.append(
            f"| {name} | {m['mAP_0.25']:.4f} | {m['mAP_0.50']:.4f} "
            f"| {m['mAR_0.25']:.4f} | {m['mAR_0.50']:.4f} |"
        )
    lines += [
        "",
        f"Wall clock: pretrain {t_pre/60:.1f} min, semi {t_semi/60:.1f} min, "
        f"total {(time.time()-t_start)/60:.1f} min.",
        "",
        "Acceptance bar: semi student mAP@0.25 above the pretrain baseline.",
        "Rerun with `python tools/validation_run.py` (pretrain resumes from",
        "its checkpoint; `--semi-overrides` varies the semi phase alone).",
    ]
    report.write_text("\n".join(lines) + "\n")
    print(json.dumps({name: m for name, m in rows}, indent=2))
    print(f"report written to {report}")


if __name__ == "__main__":
    main()
