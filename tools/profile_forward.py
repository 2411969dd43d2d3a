#!/usr/bin/env python
"""Module-level timing of the flagship forward pass (backbone / vote +
aggregation / prediction convs / quality module / quality-scale three_nn),
each as a standalone jitted apply at the shapes the B=12 train forward
sees. Fresh params — timing does not depend on weights.

    python tools/profile_forward.py [--platform cpu] [--batch 12]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--batch", type=int, default=12)
    p.add_argument("--points", type=int, default=40000)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import nesie_tpu.ops.pointops as pointops
    from nesie_tpu.nn.heads import ReliableConvBboxHead
    from nesie_tpu.nn.pointnet2 import PointNet2SASSG, PointSAModule
    from nesie_tpu.nn.side_pooling import SidePooling
    from nesie_tpu.nn.vote import VoteModule

    if jax.default_backend() == "tpu":
        pointops.set_fps_impl("pallas")
        pointops.set_ball_query_impl("pallas")

    B, N = args.batch, args.points
    key = jax.random.PRNGKey(0)

    def timed(name, fn, *fargs):
        out = fn(*fargs)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*fargs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name:44s} {dt:8.1f} ms", flush=True)
        return out

    # ---- backbone at flagship config ----
    backbone = PointNet2SASSG()
    pts = jax.random.uniform(key, (B, N, 4), jnp.float32)
    bvars = backbone.init({"params": key}, pts[:1], train=False)

    @jax.jit
    def bb_train(p):
        out, _ = backbone.apply(bvars, p, train=True, mutable=["batch_stats"])
        return out

    feat = timed("backbone (train BN)", bb_train, pts)

    @jax.jit
    def bb_eval(p):
        return backbone.apply(bvars, p, train=False)

    timed("backbone (eval BN)", bb_eval, pts)

    seed_xyz = feat["fp_xyz"][-1]
    seed_feats = jnp.swapaxes(feat["fp_features"][-1], 1, 2) \
        if feat["fp_features"][-1].shape[1] != seed_xyz.shape[1] \
        else feat["fp_features"][-1]
    n_seed = seed_xyz.shape[1]
    C = seed_feats.shape[-1]
    print(f"  seeds: {n_seed} x {C}")

    # ---- vote module + aggregation ----
    vote = VoteModule()
    vvars = vote.init({"params": key}, seed_xyz[:1], seed_feats[:1],
                      train=False)

    @jax.jit
    def vote_fn(xyz, f):
        out, _ = vote.apply(vvars, xyz, f, train=True,
                            mutable=["batch_stats"])
        return out

    vxyz, vfeat = timed("vote module", vote_fn, seed_xyz, seed_feats)[:2]

    agg = PointSAModule(num_point=256, radius=0.3, num_sample=16,
                        mlp_channels=(128, 128, 128), use_xyz=True,
                        normalize_xyz=True)
    avars = agg.init({"params": key}, vxyz[:1], vfeat[:1], train=False)

    @jax.jit
    def agg_fn(xyz, f):
        out, _ = agg.apply(avars, xyz, f, train=True,
                           mutable=["batch_stats"])
        return out

    aout = timed("vote aggregation SA", agg_fn, vxyz, vfeat)
    agg_xyz, agg_feat = aout[0], aout[1]
    P = agg_xyz.shape[1]

    # ---- prediction convs ----
    head = ReliableConvBboxHead()
    hvars = head.init({"params": key}, agg_feat[:1], train=False)

    @jax.jit
    def head_fn(f):
        out, _ = head.apply(hvars, f, train=True, mutable=["batch_stats"])
        return out

    timed("prediction convs", head_fn, agg_feat)

    # ---- quality module at train shapes (2P proposals) ----
    K2 = 2 * P
    center = jax.random.uniform(key, (B, K2, 3), jnp.float32)
    size = jax.random.uniform(key, (B, K2, 3), jnp.float32) * 0.5 + 0.3
    heading = jnp.zeros((B, K2))
    probs = jax.nn.softmax(
        jax.random.normal(key, (B, P, 6, 33)), axis=-1
    )
    sp = SidePooling()
    svars = sp.init({"params": key}, center[:1], size[:1], heading[:1],
                    seed_xyz[:1], seed_feats[:1], probs[:1], train=False)

    @jax.jit
    def sp_fn(c, s, h, sx, sf, pr):
        out, _ = sp.apply(svars, c, s, h, sx, sf, pr, train=True,
                          mutable=["batch_stats"])
        return out

    timed(f"quality module (K2={K2})", sp_fn, center, size, heading,
          seed_xyz, seed_feats, probs)

    # ---- quality-scale three_nn alone (both grids) ----
    g = 4
    grid_q = jax.random.uniform(key, (B, K2 * (6 * g * g + g ** 3), 3))

    @jax.jit
    def tnn(q, s):
        return pointops.three_nn(q, s)

    timed(f"three_nn ({grid_q.shape[1]} queries x {n_seed})", tnn,
          grid_q, seed_xyz)

    from nesie_tpu.ops.pallas_three_nn import three_nn_pallas

    @jax.jit
    def tnn_pallas(q, s):
        return three_nn_pallas(q, s)

    if jax.default_backend() == "tpu":
        timed("three_nn pallas (same shape)", tnn_pallas, grid_q, seed_xyz)


if __name__ == "__main__":
    main()
