"""Benchmark: eval-forward throughput (scenes/sec/chip) of the flagship
VoteNet-Nesie model on ScanNet-shaped inputs (B x 40000 x 4).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline is reported against the driver's 3x-vs-A100 north star once a
reference measurement exists; until then it is null.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    import nesie_tpu.ops.pointops as pointops
    from nesie_tpu.nn.detector import VoteNetNesie

    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas kernels: FPS (ops/pallas_fps.py, ~15% faster,
        # output-identical) and the fused single-pass ball query
        # (ops/pallas_ball_query.py, 2.5x at SA1 scale; neighbor sets can
        # differ from the XLA path only for exact radius-boundary points)
        pointops.set_fps_impl("pallas")
        pointops.set_ball_query_impl("pallas")

    batch = 8
    model = VoteNetNesie()
    rng = jax.random.PRNGKey(0)
    points = jax.random.uniform(rng, (batch, 40000, 4), jnp.float32)
    variables = model.init({"params": rng}, points[:1], "seed", rng, train=False)

    @jax.jit
    def forward(pts):
        out = model.apply(variables, pts, "seed", jax.random.PRNGKey(1), train=False)
        # reduce to a scalar so the sync below transfers one float — on
        # tunneled backends block_until_ready alone does not actually wait
        return (
            out["bbox_preds"],
            out["obj_scores"],
            out["iou_scores"],
            jnp.sum(out["bbox_preds"]) + jnp.sum(out["iou_scores"]),
        )

    def run_sync(pts):
        out = forward(pts)
        float(out[3])  # host transfer = true completion barrier
        return out

    run_sync(points)  # warmup / compile

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run_sync(points)
    dt = time.perf_counter() - t0

    scenes_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "scenes/sec/chip eval forward (ScanNet 40k pts)",
                "value": round(scenes_per_sec, 3),
                "unit": "scenes/sec",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
