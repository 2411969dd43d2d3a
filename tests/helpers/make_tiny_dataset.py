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

from nesie_tpu.data.synthetic import (
    make_synthetic_scenes,
    write_synthetic_scannet,
)


def make_tiny_sunrgbd(out_dir, n_train: int = 8, n_val: int = 4, seed: int = 0):
    """SUN RGB-D-format variant: 10 classes, yawed boxes, identity
    axis-align, sunrgbd_infos_*.pkl + sunrgbd_trainval split lists."""
    from nesie_tpu.data.sunrgbd_prep import write_infos as write_sunrgbd_infos

    out_dir = Path(out_dir)
    kw = dict(num_classes=10, yaw_range=np.pi / 3)
    train = make_synthetic_scenes(n_train, seed=seed, **kw)
    val = make_synthetic_scenes(n_val, seed=seed + 1, prefix="synthval", **kw)

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
    return write_synthetic_scannet(out_dir, n_train, n_val, seed=seed)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--sunrgbd"]
    out = args[0] if args else "/tmp/tiny_scannet"
    n = int(args[1]) if len(args) > 1 else 8
    if "--sunrgbd" in sys.argv:
        make_tiny_sunrgbd(out, n)
    else:
        make_tiny_dataset(out, n)
    print(f"tiny dataset written to {out}")
