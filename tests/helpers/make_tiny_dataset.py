#!/usr/bin/env python
"""Write a tiny synthetic ScanNet-format dataset for CLI smoke drives.

Produces under <out_dir>:
    points/*.bin                        float32 (N, 6) clouds
    scannet_infos_train.pkl / _val.pkl  mmdet3d-compatible infos
    meta_data/scannetv2_train_*.txt     labeled-split scan lists

Usage: python tests/helpers/make_tiny_dataset.py /tmp/tiny_scannet [n_train]
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from nesie_tpu.data.scannet_meta import VALID_CAT_IDS
from nesie_tpu.data.scannet_prep import write_infos
from nesie_tpu.data.synthetic import make_synthetic_scenes


def scene_to_export(scene):
    """Convert a synthetic Scene to the export_scan() dict layout
    (gravity-centered boxes, nyu40 category id in column 6)."""
    boxes = scene.boxes.copy()
    boxes[:, 2] += boxes[:, 5] / 2  # bottom-center -> gravity center
    cat = np.array([VALID_CAT_IDS[int(l)] for l in scene.labels], np.float32)
    boxes = np.concatenate([boxes[:, :6], cat[:, None]], axis=1)
    return dict(
        points=scene.points.astype(np.float32),
        boxes=boxes.astype(np.float32),
        axis_align_matrix=scene.axis_align.astype(np.float32),
    )


def make_tiny_dataset(out_dir, n_train: int = 8, n_val: int = 4, seed: int = 0):
    out_dir = Path(out_dir)
    train = make_synthetic_scenes(n_train, seed=seed)
    val = make_synthetic_scenes(n_val, seed=seed + 1)
    write_infos([(s.scene_id, scene_to_export(s)) for s in train],
                out_dir, "train")
    write_infos([(s.scene_id, scene_to_export(s)) for s in val],
                out_dir, "val")
    meta = out_dir / "meta_data"
    meta.mkdir(exist_ok=True)
    names = [s.scene_id for s in train]
    # every split fraction file points at the same labeled prefix (>=2 scans)
    for frac in ("0.05", "0.1", "0.2", "0.5"):
        k = max(2, len(names) // 2)
        (meta / f"scannetv2_train_{frac}.txt").write_text(
            "\n".join(names[:k]) + "\n")
    (meta / "scannetv2_train_all.txt").write_text("\n".join(names) + "\n")
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_scannet"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    make_tiny_dataset(out, n)
    print(f"tiny dataset written to {out}")
