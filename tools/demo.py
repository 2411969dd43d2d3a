#!/usr/bin/env python
"""Single-cloud inference demo (reference mmdet3d/apis/inference.py usage):
run a checkpointed detector on one .bin/.npy point cloud and dump
MeshLab-viewable .obj files.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description="Run inference on one point cloud")
    p.add_argument("config")
    p.add_argument("points", help=".bin or .npy point cloud")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--out-dir", default="demo_out")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from nesie_tpu.apis import init_detector
    from nesie_tpu.eval.visualize import show_result

    det = init_detector(args.config, args.checkpoint)
    result = det(args.points)
    keep = result["scores_3d"] > args.score_thr
    boxes = result["boxes_3d"][keep]
    print(f"{keep.sum()} detections above {args.score_thr}")
    for b, s, l in zip(boxes, result["scores_3d"][keep], result["labels_3d"][keep]):
        print(f"  class={int(l):2d} score={s:.3f} box={np.round(b, 3).tolist()}")

    from nesie_tpu.data import io

    pts = (
        np.load(args.points)[:, :3]
        if str(args.points).endswith(".npy")
        else io.load_points_bin(args.points)
    )
    out = show_result(args.out_dir, Path(args.points).stem, points=pts,
                      pred_boxes=boxes)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
