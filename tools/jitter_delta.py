#!/usr/bin/env python
"""Direct measurement of the teacher_jitter -> pseudo-label coupling.

The semi teacher runs the quality module on 2P proposals (main + jitter,
reference nesie_head.py:178-209) even though pseudo-labels consume only
the main-proposal scores (votenet_nesie.py:129-209). Under train-mode BN
the ONLY coupling from the jitter copies to the pseudo-labels is the
quality module's BN *batch statistics* being computed over 2P instead of
P proposals. `teacher_jitter=False` (config.teacher_jitter) drops the
jitter copies and saves ~37 ms/step on TPU (452 -> 415 ms, r3 bench).

This tool quantifies the coupling directly: it loads a pretrain
checkpoint, runs the SAME weak-view batches through the teacher both
ways, and reports the iou-score deltas and the pseudo-label selection
agreement at reference and relaxed thresholds. If selections are near-
identical, an mAP A/B can only measure noise — the flag is a pure
speed/parity trade.

    python tools/jitter_delta.py --root /tmp/val_ab --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from validation_run import MID_MODEL  # noqa: E402  (same mid-size model)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/val_ab",
                   help="validation_run --out dir (data/ + work/ inside)")
    p.add_argument("--platform", default=None)
    p.add_argument("--batches", type=int, default=8)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.augment import augment_points
    from nesie_tpu.data.dataset import SimiScanNetScenes
    from nesie_tpu.train import runner
    from nesie_tpu.train.pseudo_label import get_pseudo_labels
    from nesie_tpu.train.semi import UlbState
    from nesie_tpu.train.pseudo_label import classwise_acc

    root = Path(args.root)
    model_over = [f"model.{k}={v}" for k, v in MID_MODEL.items()]
    pcfg = get_config("nesie-votenet-scannet-pretrain-010")
    pcfg = apply_overrides(pcfg, model_over +
                           [f"data.num_points={args.num_points}"])
    pcfg = dataclasses.replace(pcfg, num_devices=1,
                               work_dir=str(root / "work"))
    model = runner.build_model(pcfg)
    state, _ = runner.init_state(pcfg, model, steps_per_epoch=1)
    ckpt = runner.CheckpointManager(Path(pcfg.work_dir) / pcfg.name)
    state, _, at = ckpt.restore(state, mesh_size=1)
    print(f"restored pretrain checkpoint at step {at}", file=sys.stderr)

    scfg = get_config("nesie-votenet-scannet-train-010")
    scfg = apply_overrides(scfg, model_over +
                           [f"data.num_points={args.num_points}"])
    ds = SimiScanNetScenes(root / "data",
                           root / "data" / scfg.data.train_ann_file,
                           root / "data" / scfg.data.label_list_file,
                           ratio=scfg.data.unlabeled_ratio)
    ulb = UlbState.create(ds.num_unlabeled, scfg.model.num_classes)
    acc = classwise_acc(ulb.ulb_list, ulb.ulb_flag, ds.num_labeled,
                        scfg.pseudo.thresh_warmup,
                        literal=scfg.pseudo.literal_reference_cbl)

    # teacher params: pretrain has no EMA -> teacher == student weights
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    from functools import partial

    @partial(jax.jit, static_argnames=("with_jitter",))
    def teacher(points, rng, with_jitter):
        out, _ = model.apply(variables, points, scfg.sample_mod_train, rng,
                             train=True, with_jitter=with_jitter,
                             mutable=["batch_stats"])
        return out

    relaxed = dataclasses.replace(
        scfg.pseudo, obj_thr=0.5, cls_thr_base=0.0, cls_thr_cap=0.5,
        iou_thr_base=0.05, iou_thr_cap=0.1,
    )

    rng_np = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    stats = dict(d_iou_max=0.0, d_iou_mean=0.0, d_obj_max=0.0, n=0)
    agree = {"reference": dict(on=0, off=0, inter=0),
             "relaxed": dict(on=0, off=0, inter=0)}
    for b in range(args.batches):
        batch = ds.semi_batch(
            list(rng_np.integers(0, ds.num_labeled, size=2)), rng_np,
            strong_cfg=runner.strong_aug_config(scfg),
            num_points=args.num_points, n_unlabeled=4,
        )
        pts = augment_points(jnp.asarray(batch["points_raw_t"]),
                             jax.tree.map(jnp.asarray, batch["aug_t"]),
                             shift_height=True)
        key, sub = jax.random.split(key)
        out_on = teacher(pts, sub, True)
        out_off = teacher(pts, sub, False)

        d_iou = np.abs(np.asarray(out_on["iou_scores"])
                       - np.asarray(out_off["iou_scores"]))
        d_obj = np.abs(np.asarray(out_on["obj_scores"])
                       - np.asarray(out_off["obj_scores"]))
        stats["d_iou_max"] = max(stats["d_iou_max"], float(d_iou.max()))
        stats["d_iou_mean"] += float(d_iou.mean())
        stats["d_obj_max"] = max(stats["d_obj_max"], float(d_obj.max()))
        stats["n"] += 1

        for tag, cfg_pl in (("reference", scfg.pseudo), ("relaxed", relaxed)):
            pl_on = get_pseudo_labels(out_on, acc, cfg_pl)
            pl_off = get_pseudo_labels(out_off, acc, cfg_pl)
            von = np.asarray(pl_on.valid)
            voff = np.asarray(pl_off.valid)
            # selection agreement by (sample, box) identity: compare the
            # selected box sets through their coordinates
            bon = np.asarray(pl_on.boxes)[von]
            boff = np.asarray(pl_off.boxes)[voff]
            inter = 0
            for row in bon:
                if len(boff) and np.any(np.all(np.isclose(
                        boff, row, atol=1e-4), axis=1)):
                    inter += 1
            agree[tag]["on"] += int(von.sum())
            agree[tag]["off"] += int(voff.sum())
            agree[tag]["inter"] += inter

    stats["d_iou_mean"] /= max(stats["n"], 1)
    result = dict(checkpoint_step=int(at), batches=args.batches,
                  iou_score_delta=dict(max=stats["d_iou_max"],
                                       mean=stats["d_iou_mean"]),
                  obj_score_delta_max=stats["d_obj_max"],
                  selection_agreement=agree)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
