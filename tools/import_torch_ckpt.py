#!/usr/bin/env python
"""Import a reference torch checkpoint (.pth) into an evaluable orbax
checkpoint.

The reference trainer saves ``{"state_dict": ..., "meta": ..., "optimizer":
...}`` with the EMA teacher riding as ``ema_<mangled>`` buffers inside the
state_dict (train.py:203-213 + simi_teacher_hook.py:39-52). This tool is
the missing middle of the migration path:

    python tools/import_torch_ckpt.py <config> ckpt.pth --work-dir WORK
    python tools/test.py <config> WORK/<config>/checkpoints --data-root ...

It builds the model from the named config, converts the state_dict with
``nesie_tpu.convert_torch``, VALIDATES the converted pytree against the
flax-initialized one (exact tree structure + every leaf shape — a wrong
architecture or a truncated .pth fails loudly here, not as NaN mAP), and
writes a step-0 TrainState checkpoint with the teacher populated from the
``ema_*`` buffers (falling back to a student clone when the .pth is a
pretrain checkpoint with no EMA, the reference's load_from semantics).

Rehearsed end to end in tests/test_ckpt_parity_cli.py.
"""
from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def validate_tree(converted, initialized, what):
    """Exact structure + per-leaf shape equality."""
    import jax

    c_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(converted)
    }
    i_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_leaves_with_path(initialized)
    }
    missing = sorted(set(i_paths) - set(c_paths))
    extra = sorted(set(c_paths) - set(i_paths))
    if missing or extra:
        raise SystemExit(
            f"{what}: converted tree does not match the model.\n"
            f"  missing from .pth: {missing[:8]}{'...' if len(missing) > 8 else ''}\n"
            f"  unexpected in .pth: {extra[:8]}{'...' if len(extra) > 8 else ''}"
        )
    bad = [
        (k, c_paths[k], i_paths[k])
        for k in i_paths
        if tuple(c_paths[k]) != tuple(i_paths[k])
    ]
    if bad:
        raise SystemExit(f"{what}: shape mismatches: {bad[:8]}")


def import_checkpoint(cfg, pth_path, work_dir):
    import jax

    from nesie_tpu.convert_torch import (
        convert_state_dict,
        extract_ema,
        load_torch_checkpoint,
    )
    from nesie_tpu.train import runner

    model = runner.build_model(cfg)
    fresh, _ = runner.init_state(cfg, model, steps_per_epoch=1)

    sd = load_torch_checkpoint(pth_path)
    params, stats = convert_state_dict(sd, num_sa=len(cfg.model.num_points),
                                       num_fp=len(cfg.model.fp_channels),
                                       head=cfg.model.head)
    validate_tree(params, fresh.params, "params")
    validate_tree(stats, fresh.batch_stats, "batch_stats")

    ema_sd = extract_ema(sd)
    if ema_sd:
        ema_params, _ = convert_state_dict(
            ema_sd, num_sa=len(cfg.model.num_points),
            num_fp=len(cfg.model.fp_channels), head=cfg.model.head)
        validate_tree(ema_params, fresh.params, "ema_params")
        logging.info("EMA teacher restored from %d ema_* buffers",
                     len(ema_sd))
    else:
        ema_params = jax.tree.map(np.copy, params)
        logging.info("no ema_* buffers: teacher initialized as a student "
                     "clone (pretrain-checkpoint load_from semantics)")

    as_jnp = lambda t: jax.tree.map(jax.numpy.asarray, t)  # noqa: E731
    state = fresh._replace(
        params=as_jnp(params),
        batch_stats=as_jnp(stats),
        ema_params=as_jnp(ema_params),
        ema_batch_stats=as_jnp(jax.tree.map(np.copy, stats)),
    )
    work = Path(work_dir) / cfg.name
    ckpt = runner.CheckpointManager(work)
    ckpt.save(0, state, meta={"mesh_size": 1, "imported_from": str(pth_path)})
    ckpt.mgr.wait_until_finished()
    return work / "checkpoints"


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("pth")
    p.add_argument("--work-dir", required=True)
    p.add_argument("--platform", default=None)
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from nesie_tpu.config import apply_overrides, get_config

    cfg = get_config(args.config)
    cfg = apply_overrides(cfg, args.cfg_options)
    out = import_checkpoint(cfg, args.pth, args.work_dir)
    print(f"imported checkpoint at {out}")


if __name__ == "__main__":
    main()
