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


def make_tiny_sunrgbd(out_dir, n_train: int = 8, n_val: int = 4, seed: int = 0):
    """SUN RGB-D-format variant: 10 classes, yawed boxes, identity
    axis-align, sunrgbd_infos_*.pkl + sunrgbd_trainval split lists."""
    from nesie_tpu.data.sunrgbd_prep import write_infos as write_sunrgbd_infos

    out_dir = Path(out_dir)
    kw = dict(num_classes=10, yaw_range=np.pi / 3)
    train = make_synthetic_scenes(n_train, seed=seed, **kw)
    val = make_synthetic_scenes(n_val, seed=seed + 1, **kw)

    def to_export(scene):
        boxes = scene.boxes.copy()
        boxes[:, 2] += boxes[:, 5] / 2  # bottom-center -> gravity center
        return dict(points=scene.points[:, :3].astype(np.float32),
                    boxes=boxes.astype(np.float32),
                    labels=scene.labels.astype(np.int64))

    write_sunrgbd_infos([(s.scene_id, to_export(s)) for s in train],
                        out_dir, "train")
    write_sunrgbd_infos([(s.scene_id, to_export(s)) for s in val],
                        out_dir, "val")
    meta = out_dir / "sunrgbd_trainval"
    meta.mkdir(exist_ok=True)
    names = [s.scene_id for s in train]
    for frac in ("0.05", "0.1", "0.2", "0.5"):
        (meta / f"sunrgbd_v1_train_{frac}.txt").write_text(
            "\n".join(names[:max(2, len(names) // 2)]) + "\n")
    (meta / "sunrgbd_v1_train_1.0.txt").write_text("\n".join(names) + "\n")
    return out_dir


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
    args = [a for a in sys.argv[1:] if a != "--sunrgbd"]
    out = args[0] if args else "/tmp/tiny_scannet"
    n = int(args[1]) if len(args) > 1 else 8
    if "--sunrgbd" in sys.argv:
        make_tiny_sunrgbd(out, n)
    else:
        make_tiny_dataset(out, n)
    print(f"tiny dataset written to {out}")
