#!/usr/bin/env python
"""Diagnose the EMA-teacher eval collapse (VERDICT round-3 weak #1).

PARITY_RESULTS round 3: pretrain 0.0307 mAP@0.25, semi student 0.0511,
but semi EMA teacher 0.0098 — 3x below its own initialization. This tool
bisects where the decay comes from, on the same generated dataset:

  1. sanity: teacher eval at semi step 0 must equal the pretrain eval
     (by construction ema_params is a copy of the loaded params),
  2. per-epoch curves: student vs teacher mAP through the semi phase,
  3. end-state pairing probes separating parameter blending from BN-stat
     mismatch:
       - teacher params + final student batch_stats   (the default pairing)
       - teacher params + pretrain batch_stats
       - pretrain params + final student batch_stats
       - 0.5*(pretrain+student) params + student stats (loss-barrier probe)

Hypothesis under test: with ~780 semi steps at momentum 1e-3 the teacher
is a ~46/54 parameter-space interpolation between the pretrain model and
an EMA of the early training trajectory — linear blends of distant
networks generically sit behind a loss barrier.  The reference never runs
in this regime: its real runs take m*N = 1e-3 * ~5400 steps ~ 5.4, so the
teacher converges to a lagged student (simi_teacher_hook.py:54-64 keeps
m fixed).  `--ema-momentum` lets a second run match the reference's m*N
product on the short synthetic horizon to confirm.

    python tools/diagnose_teacher.py --out /tmp/validation --platform cpu
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from validation_run import MID_MODEL, eval_mAP  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/validation")
    p.add_argument("--n-train", type=int, default=128)
    p.add_argument("--n-val", type=int, default=32)
    p.add_argument("--num-points", type=int, default=4096)
    p.add_argument("--pretrain-epochs", type=int, default=14)
    p.add_argument("--semi-epochs", type=int, default=12)
    p.add_argument("--eval-every", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema-momentum", type=float, default=None,
                   help="override cfg.ema_momentum for the semi phase")
    p.add_argument("--platform", default=None)
    p.add_argument("--json-out", default="/tmp/diagnose_teacher.json")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import (
        ScanNetScenes,
        SimiScanNetScenes,
        SubScanNetScenes,
    )
    from nesie_tpu.data.synthetic import write_synthetic_scannet
    from nesie_tpu.train import runner

    out = Path(args.out)
    root = out / "data"
    if not (root / "scannet_infos_train.pkl").exists():
        write_synthetic_scannet(root, args.n_train, args.n_val, seed=args.seed)

    model_over = [f"model.{k}={v}" for k, v in MID_MODEL.items()]
    common_over = [f"data.num_points={args.num_points}", "log_interval=20"]

    # ---- pretrain (resumes from the round-3 checkpoint if present) ----
    pcfg = get_config("nesie-votenet-scannet-pretrain-010")
    pcfg = apply_overrides(pcfg, model_over + common_over + [
        f"optim.max_epochs={args.pretrain_epochs}",
        f"optim.lr_milestones=({int(args.pretrain_epochs*0.7)},"
        f"{int(args.pretrain_epochs*0.9)})",
        "data.samples_per_step=4",
        "data.repeat=10",
        f"checkpoint_interval_epochs={args.pretrain_epochs}",
    ])
    pcfg = dataclasses.replace(pcfg, seed=args.seed, num_devices=1,
                               work_dir=str(out / "work"))
    pre_ds = SubScanNetScenes(root, root / pcfg.data.train_ann_file,
                              root / pcfg.data.label_list_file)
    model = runner.build_model(pcfg)
    pre_state = runner.train_supervised(pcfg, pre_ds, resume=True)

    val_ds = ScanNetScenes(root, root / pcfg.data.val_ann_file)
    report = {"curve": [], "probes": {}, "args": vars(args)}

    pre_map = eval_mAP(pcfg, model, pre_state, val_ds, args.num_points)
    logging.info("pretrain: %s", pre_map)
    report["probes"]["pretrain"] = pre_map

    # ---- semi phase with per-epoch teacher/student curves ----
    scfg = get_config("nesie-votenet-scannet-train-010")
    scfg = apply_overrides(scfg, model_over + common_over + [
        f"optim.max_epochs={args.semi_epochs}",
        f"optim.lr_milestones=({int(args.semi_epochs*0.7)},"
        f"{int(args.semi_epochs*0.9)})",
        "optim.lr=0.004",
        "data.samples_per_step=2",
        "data.repeat=10",
        "checkpoint_interval_epochs=1000",
    ])
    scfg = dataclasses.replace(scfg, seed=args.seed, num_devices=1,
                               work_dir=str(out / "work"))
    if args.ema_momentum is not None:
        scfg = dataclasses.replace(scfg, ema_momentum=args.ema_momentum)
    semi_ds = SimiScanNetScenes(root, root / scfg.data.train_ann_file,
                                root / scfg.data.label_list_file,
                                ratio=scfg.data.unlabeled_ratio)
    fresh, _ = runner.init_state(scfg, model, steps_per_epoch=1)
    load_state = runner.weights_only_load(fresh, pre_state)
    # host snapshots for the end-state probes: the jitted semi step DONATES
    # its state, which deletes the device buffers weights_only_load shares
    # with pre_state
    import numpy as np

    pre_params = jax.tree.map(np.array, pre_state.params)
    pre_stats = jax.tree.map(np.array, pre_state.batch_stats)

    # sanity: teacher at step 0 == pretrain eval, numerically
    t0_map = eval_mAP(scfg, model, load_state, val_ds, args.num_points,
                      use_teacher=True)
    logging.info("teacher@step0: %s (must == pretrain)", t0_map)
    report["probes"]["teacher_step0"] = t0_map

    def cb(epoch, state):
        if (epoch + 1) % args.eval_every and epoch + 1 != args.semi_epochs:
            return
        s = eval_mAP(scfg, model, state, val_ds, args.num_points)
        t = eval_mAP(scfg, model, state, val_ds, args.num_points,
                     use_teacher=True)
        logging.info("epoch %d: student %.4f teacher %.4f (mAP@0.25)",
                     epoch, s["mAP_0.25"], t["mAP_0.25"])
        report["curve"].append(dict(epoch=epoch, student=s, teacher=t))
        Path(args.json_out).write_text(json.dumps(report, indent=2))

    semi_state = runner.train_semi(scfg, semi_ds, load_state,
                                   epoch_callback=cb)

    # ---- end-state pairing probes ----
    def probe(name, params, batch_stats):
        st = semi_state._replace(params=params, batch_stats=batch_stats,
                                 ema_params=params,
                                 ema_batch_stats=batch_stats)
        m = eval_mAP(scfg, model, st, val_ds, args.num_points)
        logging.info("probe %s: %s", name, m)
        report["probes"][name] = m
        Path(args.json_out).write_text(json.dumps(report, indent=2))

    probe("student_final", semi_state.params, semi_state.batch_stats)
    probe("teacher+student_stats", semi_state.ema_params,
          semi_state.batch_stats)
    probe("teacher+pretrain_stats", semi_state.ema_params, pre_stats)
    probe("pretrain+student_stats", pre_params, semi_state.batch_stats)
    mid = jax.tree.map(lambda a, b: 0.5 * a + 0.5 * b,
                       pre_params, semi_state.params)
    probe("midpoint+student_stats", mid, semi_state.batch_stats)

    Path(args.json_out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report["probes"], indent=2))


if __name__ == "__main__":
    main()
