#!/usr/bin/env python
"""Worker for the 2-process train_semi test: each process owns 4 virtual
CPU devices and feeds its slice of the global batch through the
PRODUCTION runner. Dumps final params so the test can assert both
processes hold the identical global model.

Usage: python multihost_worker.py <pid> <nproc> <port> <workdir>
"""
import os
import sys
from pathlib import Path

pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np

from nesie_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
)
from nesie_tpu.data.dataset import SimiScanNetScenes
from nesie_tpu.data.synthetic import make_synthetic_scenes
from nesie_tpu.train.pseudo_label import PseudoLabelConfig
from nesie_tpu.train.runner import train_semi
from nesie_tpu.train.sup_loss import NesieLossConfig

C = 4
scenes = make_synthetic_scenes(16, seed=3, num_classes=C,
                               points_per_object=80, floor_points=400)
ds = SimiScanNetScenes(scenes=scenes,
                       labeled_ids=[s.scene_id for s in scenes], ratio=2)
cfg = ExperimentConfig(
    name="semi-mp",
    mode="semi",
    model=ModelConfig(
        num_classes=C, reg_max=8, num_proposal=16,
        num_points=(64, 32, 16, 16), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
        fp_channels=((32, 32), (32, 32)),
    ),
    optim=OptimConfig(lr=1e-3, max_epochs=1, lr_milestones=(100,)),
    data=DataConfig(samples_per_step=1, repeat=1, num_points=256),
    loss=NesieLossConfig(num_classes=C),
    pseudo=PseudoLabelConfig(num_classes=C, max_num_obj=8),
    num_devices=None,  # all 8 global devices
    log_interval=1,
    checkpoint_interval_epochs=10,
    work_dir=f"{workdir}/work{pid}",
)
state = train_semi(cfg, ds)
leaves = jax.tree_util.tree_leaves(state.params)
np.savez(Path(workdir) / f"params_p{pid}.npz",
         *[np.asarray(l) for l in leaves], step=int(state.step))
print(f"worker {pid} done at step {int(state.step)}", flush=True)
