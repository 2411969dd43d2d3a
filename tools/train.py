#!/usr/bin/env python
"""Training CLI (reference train.py equivalent).

Examples:
    python tools/train.py nesie-votenet-scannet-pretrain-010 \
        --data-root /data/scannet
    python tools/train.py nesie-votenet-scannet-train-010 \
        --data-root /data/scannet --load-from work_dirs/.../checkpoints
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="Train a nesie_tpu detector")
    p.add_argument("config", help="named config, e.g. nesie-votenet-scannet-train-010")
    p.add_argument("--data-root", required=True)
    p.add_argument("--work-dir", default="work_dirs")
    p.add_argument("--load-from", default=None,
                   help="checkpoint dir to initialize from (pretrain ckpt)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) — overrides any "
                        "site-level jax_platforms setting")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed for multi-host pods "
                        "(the reference's init_dist/NCCL bootstrap; "
                        "coordinator/process env comes from the TPU "
                        "runtime or JAX_COORDINATOR_ADDRESS etc.)")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel mesh size (default: all devices)")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="linear-scale lr by num_devices/8 "
                        "(reference train.py:127-129)")
    p.add_argument("--cfg-options", nargs="*", default=[],
                   help="dot-path overrides, e.g. optim.lr=0.004")
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    from nesie_tpu.utils import enable_compile_cache

    enable_compile_cache()
    if args.multihost:
        import jax

        jax.distributed.initialize()
        logging.info("jax.distributed: process %d/%d, %d local / %d global devices",
                     jax.process_index(), jax.process_count(),
                     jax.local_device_count(), jax.device_count())

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import SimiScanNetScenes, SubScanNetScenes
    from nesie_tpu.train import runner

    cfg = get_config(args.config)
    cfg = dataclasses.replace(cfg, seed=args.seed, work_dir=args.work_dir,
                              num_devices=args.num_devices)
    cfg = apply_overrides(cfg, args.cfg_options)
    if args.autoscale_lr:
        import jax

        n_dev = cfg.num_devices or jax.device_count()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, lr=cfg.optim.lr * n_dev / 8)
        )
        logging.info("autoscaled lr to %g for %d devices", cfg.optim.lr, n_dev)

    # dump the resolved config into the work dir (reference train.py:144)
    work = Path(args.work_dir) / cfg.name
    work.mkdir(parents=True, exist_ok=True)
    import json

    (work / "config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
    )

    root = Path(args.data_root)
    ann = root / cfg.data.train_ann_file
    split = root / cfg.data.label_list_file

    load_state = None
    if args.load_from:
        import jax
        from nesie_tpu.train.runner import CheckpointManager, build_model, init_state

        model = runner.build_model(cfg)
        state, _ = runner.init_state(cfg, model, steps_per_epoch=1)
        mgr = CheckpointManager(Path(args.load_from).parent)
        loaded, _, step = mgr.restore(state)
        load_state = runner.weights_only_load(state, loaded)
        logging.info("loaded weights at step %d from %s", step, args.load_from)

    if cfg.mode == "pretrain":
        ds = SubScanNetScenes(root, ann, split)
        runner.train_supervised(cfg, ds, load_state, resume=args.resume)
    else:
        ds = SimiScanNetScenes(root, ann, split, ratio=cfg.data.unlabeled_ratio)
        runner.train_semi(cfg, ds, load_state, resume=args.resume)


if __name__ == "__main__":
    main()
