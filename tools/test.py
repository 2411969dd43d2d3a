#!/usr/bin/env python
"""Evaluation CLI (reference test.py equivalent): run the detector over the
val split and report indoor mAP@0.25/0.5."""
from __future__ import annotations

import argparse
import dataclasses
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a nesie_tpu detector")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir")
    p.add_argument("--data-root", required=True)
    p.add_argument("--batch-size", type=int, default=8,
                   help="scenes per device per step")
    p.add_argument("--num-devices", type=int, default=None,
                   help="data-parallel eval mesh size (default: all devices; "
                        "the reference's MMDistributedDataParallel test path, "
                        "test.py:186-191)")
    p.add_argument("--seed", type=int, default=9)
    p.add_argument("--teacher", action="store_true",
                   help="evaluate the EMA teacher weights")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    p.add_argument("--dump-raw", default=None,
                   help="directory to dump raw head outputs per scene "
                        "(the reference test_cfg.add_info equivalent)")
    p.add_argument("--presampled", default=None,
                   help="evaluate a tools/dump_eval_set.py dump (reference-"
                        "identical IndoorPointSample clouds) instead of "
                        "sampling from --data-root")
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from nesie_tpu.utils import enable_compile_cache

    enable_compile_cache()

    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import ScanNetScenes
    from nesie_tpu.eval import decode_and_nms, indoor_eval
    from nesie_tpu.eval.postprocess import expand_per_class
    from nesie_tpu.train import runner
    from nesie_tpu.train.runner import CheckpointManager
    from nesie_tpu.train.step import make_eval_forward

    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.cfg_options)

    if cfg.model.dataset_name == "SUNRGBD":
        from nesie_tpu.data.sunrgbd_prep import CLASS_NAMES
    else:
        from nesie_tpu.data.scannet_meta import CLASS_NAMES

    root = Path(args.data_root)
    if args.presampled:
        from nesie_tpu.data.dataset import PresampledScanNetScenes

        ds = PresampledScanNetScenes(args.presampled)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          num_points=ds.num_points))
    else:
        ds = ScanNetScenes(root, root / cfg.data.val_ann_file)
    model = runner.build_model(cfg)
    state, _ = runner.init_state(cfg, model, steps_per_epoch=1)
    mgr = CheckpointManager(Path(args.checkpoint).parent)
    state, _, step = mgr.restore(state)
    logging.info("restored step %d", step)

    fwd = make_eval_forward(model, cfg.test.sample_mod, use_teacher=args.teacher)
    if cfg.test.iou_opt:
        # test-time IoU optimization (reference iou_opt_test,
        # votenet_nesie.py:501-571; enable with test.iou_opt=true)
        from functools import partial

        from nesie_tpu.eval.iou_opt import iou_opt_boxes

        base_fwd = fwd
        refine = jax.jit(partial(
            iou_opt_boxes, model,
            opt_rate=cfg.test.opt_rate, opt_step=cfg.test.opt_step,
            dataset_name=cfg.model.dataset_name,
        ))

        def fwd(state, points, key):  # noqa: F811
            out = base_fwd(state, points, key)
            variables = {
                "params": state.ema_params if args.teacher else state.params,
                "batch_stats": state.ema_batch_stats
                if args.teacher else state.batch_stats,
            }
            return refine(variables, out)

    # data-parallel eval: replicate state, shard each batch over the mesh
    from nesie_tpu.parallel import make_mesh, replicate, shard_host_batch

    mesh = make_mesh(args.num_devices)
    state = replicate(state, mesh)
    logging.info("eval mesh: %d devices", mesh.size)

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    gt_annos, dt_annos = [], []
    bs = args.batch_size * mesh.size  # global batch
    n = len(ds)

    # prefetch the next host batch while the device computes (single-reader
    # thread, so the shared numpy rng stays sequential / deterministic)
    from concurrent.futures import ThreadPoolExecutor

    loader = ThreadPoolExecutor(max_workers=1)

    def load(start):
        idx = list(range(start, min(start + bs, n)))
        n_real = len(idx)
        idx = idx + [idx[-1]] * (bs - n_real)  # pad the tail batch
        return start, n_real, ds.eval_batch(idx, rng, cfg.data.num_points)

    def postprocess(start, n_real, batch, out, decoded):
        decoded = jax.tree.map(np.asarray, decoded)  # device sync here
        if args.dump_raw:
            dump_dir = Path(args.dump_raw)
            dump_dir.mkdir(parents=True, exist_ok=True)
            raw = {
                k: np.asarray(out[k])
                for k in ("bbox_preds", "obj_scores", "sem_scores",
                          "iou_scores", "side_scores", "surface_pred",
                          "aggregated_points", "bbox_probs")
                if k in out
            }
            for b in range(n_real):
                np.savez(
                    dump_dir / f"{batch['scene_ids'][b]}.npz",
                    **{k: v[b] for k, v in raw.items()},
                )
        for b in range(n_real):
            boxes, scores, labels = expand_per_class(
                {k: v[b] for k, v in decoded.items()}
            )
            dt_annos.append(dict(boxes=boxes, scores=scores, labels=labels))
            gb = batch["gt_boxes"][b][batch["gt_valid"][b]]
            gb = gb.copy()
            gb[:, 2] += gb[:, 5] / 2  # bottom -> gravity center
            gt_annos.append(dict(
                boxes=gb, labels=batch["gt_labels"][b][batch["gt_valid"][b]]
            ))
        logging.info("evaluated %d/%d scenes", start + n_real, n)

    pending = loader.submit(load, 0)
    in_flight = None  # previous batch, results still on device
    while pending is not None:
        start, n_real, batch = pending.result()
        nxt = start + bs
        pending = loader.submit(load, nxt) if nxt < n else None
        points = shard_host_batch(batch["points"], mesh)
        key, sub = jax.random.split(key)
        out = fwd(state, points, sub)
        decoded = decode_and_nms(
            out, points,
            nms_thr=cfg.test.nms_thr,
            score_thr=cfg.test.score_thr,
            use_iou_for_nms=cfg.test.use_iou_for_nms,
        )
        # pull + postprocess the PREVIOUS batch now that this one is
        # dispatched: host AP bookkeeping overlaps device compute
        if in_flight is not None:
            postprocess(*in_flight)
        in_flight = (start, n_real, batch, out, decoded)
    if in_flight is not None:
        postprocess(*in_flight)

    results = indoor_eval(gt_annos, dt_annos, class_names=list(CLASS_NAMES))
    for k in sorted(results):
        if k.startswith("mAP") or k.startswith("mAR"):
            print(f"{k}: {results[k]:.4f}")
    print({k: round(v, 4) for k, v in results.items() if "_AP_" in k})


if __name__ == "__main__":
    main()
