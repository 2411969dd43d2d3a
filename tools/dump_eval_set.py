#!/usr/bin/env python
"""Dump a reference-identical pre-sampled eval set.

The reference's eval pipeline subsamples each cloud with
``IndoorPointSample`` (transforms_3d.py:819-861): ONE
``np.random.choice(n, num_points, replace=(n < num_points))`` drawn from
the legacy GLOBAL ``np.random`` state per scene, scenes visited in info
order. nesie_tpu's eval path draws from a ``np.random.Generator`` instead,
so side-by-side evaluations on the same data differ by sampling noise
(~±0.2 mAP, REFERENCE_QUIRKS "Eval-protocol notes").

This tool removes that noise: it replays the reference's exact call
sequence — ``np.random.seed(seed)`` once, then one legacy ``choice`` per
scene in info order — and writes the post-sample clouds to disk. Both
frameworks can then evaluate the SAME fixed clouds:

    python tools/dump_eval_set.py --data-root DATA --out DATA/presampled \
        --num-points 40000 --seed 0
    # nesie_tpu side: PresampledScanNetScenes(out_dir) in place of
    # ScanNetScenes; tools/test.py --presampled DATA/presampled

The choice indices are applied to the aligned+height cloud — global
alignment and shift_height are deterministic per-point ops that preserve
row order, so row selection commutes with them and the dumped clouds
equal the reference's post-``IndoorPointSample`` points (+height channel).

Oracled in tests/test_presample_dump.py against the reference's own
``IndoorPointSample`` running under refshim with the same seed.
"""
from __future__ import annotations

import argparse
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def reference_choice(n: int, num_points: int) -> np.ndarray:
    """The exact draw IndoorPointSample.points_random_sampling makes
    (transforms_3d.py:833-861): legacy global RandomState, replacement
    only when the cloud is smaller than the target."""
    replace = n < num_points
    return np.random.choice(n, num_points, replace=replace)


def dump_eval_set(data_root, ann_file, out_dir, num_points: int, seed: int):
    from nesie_tpu.data import io
    from nesie_tpu.data.dataset import ScanNetScenes

    out_dir = Path(out_dir)
    (out_dir / "points").mkdir(parents=True, exist_ok=True)
    ds = ScanNetScenes(data_root, ann_file)
    infos = io.load_infos(ann_file)

    np.random.seed(seed)  # the reference runner's set_random_seed
    manifest = []
    for i, scene in enumerate(ds.scenes):
        pts = io.load_points_bin(scene.pts_path)
        pts = io.global_alignment(pts, scene.axis_align)
        pts = io.add_height(pts).astype(np.float32)
        choices = reference_choice(len(pts), num_points)
        sampled = pts[choices]
        rel = f"points/{scene.scene_id}.npy"
        np.save(out_dir / rel, sampled)
        manifest.append(
            dict(scene_id=scene.scene_id, pts_file=rel, num_raw=len(pts),
                 info=infos[i])
        )
    meta = dict(num_points=num_points, seed=seed,
                source_ann_file=str(ann_file), scenes=manifest)
    with open(out_dir / "presampled_infos.pkl", "wb") as f:
        pickle.dump(meta, f)
    return out_dir


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--ann-file", default=None,
                   help="defaults to <data-root>/scannet_infos_val.pkl")
    p.add_argument("--out", required=True)
    p.add_argument("--num-points", type=int, default=40000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    ann = args.ann_file or str(Path(args.data_root) / "scannet_infos_val.pkl")
    out = dump_eval_set(args.data_root, ann, args.out, args.num_points,
                        args.seed)
    print(f"pre-sampled eval set written to {out}")


if __name__ == "__main__":
    main()
