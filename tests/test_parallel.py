"""Data-parallel correctness: the same supervised step, sharded over the
8-device CPU mesh vs unsharded, must produce (near-)identical losses and
parameters — jit's single-program semantics make sync-BN and gradient
all-reduce implicit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.parallel import make_mesh, replicate, shard_batch
from nesie_tpu.train.state import create_train_state, make_lr_schedule, make_optimizer
from nesie_tpu.train.step import make_supervised_train_step
from nesie_tpu.train.sup_loss import NesieLossConfig

C = 4
TINY = dict(
    num_classes=C,
    reg_max=8,
    num_proposal=16,
    num_points=(64, 32, 16, 16),
    num_samples=(8, 8, 4, 4),
    sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
    fp_channels=((32, 32), (32, 32)),
)


def _make_batch(B, N=128, MG=8):
    r = np.random.RandomState(0)
    batch = dict(
        points=jnp.asarray(r.uniform(size=(B, N, 4)).astype(np.float32)),
        gt_boxes=jnp.zeros((B, MG, 7))
        .at[:, :2, 3:6].set(0.5)
        .at[:, :2, :3].set(jnp.asarray(r.uniform(0.2, 0.8, (B, 2, 3)))),
        gt_labels=jnp.zeros((B, MG), jnp.int32),
        gt_valid=jnp.zeros((B, MG), bool).at[:, :2].set(True),
    )
    return batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_step_matches_single_device():
    B = 8
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    batch = _make_batch(B)
    variables = model.init({"params": rng}, batch["points"], "vote", rng)
    tx = make_optimizer(make_lr_schedule(1e-3, 10))
    step = make_supervised_train_step(model, tx, NesieLossConfig(num_classes=C))

    def fresh_vars():
        return jax.tree.map(jnp.copy, variables)

    # single device
    state1 = create_train_state(fresh_vars(), tx)
    s1, m1 = step(state1, batch, jax.random.PRNGKey(1))

    # 8-device dp mesh
    mesh = make_mesh(8)
    state2 = create_train_state(fresh_vars(), tx)
    state2 = replicate(state2, mesh)
    sharded = shard_batch(batch, mesh)
    with mesh:
        s2, m2 = step(state2, sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=2e-3
    )
    # Adam at step 1 is sign-like (m/sqrt(v) = ±1), so reduction-order noise
    # on near-zero grads flips updates by up to 2*lr; bound by that.
    lr = 1e-3
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    worst = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(l1, l2))
    assert worst <= 2.5 * lr, worst


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_train_semi_sharded_matches_single_device(tmp_path):
    """The PRODUCTION semi loop (train_semi) on the 8-device mesh must match
    a single-device run with the same global batch: same data order, same
    PRNG keys, gradient all-reduce implicit in SPMD."""
    import dataclasses

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

    scenes = make_synthetic_scenes(
        16, seed=3, num_classes=C, points_per_object=80, floor_points=400
    )
    lr = 1e-3

    def run(num_devices, samples_per_step, tag):
        ds = SimiScanNetScenes(
            scenes=scenes, labeled_ids=[s.scene_id for s in scenes], ratio=2
        )
        cfg = ExperimentConfig(
            name=f"semi-dp-{tag}",
            mode="semi",
            model=ModelConfig(**TINY),
            optim=OptimConfig(lr=lr, max_epochs=1, lr_milestones=(100,)),
            data=DataConfig(samples_per_step=samples_per_step, repeat=1,
                            num_points=256),
            loss=NesieLossConfig(num_classes=C),
            pseudo=PseudoLabelConfig(num_classes=C, max_num_obj=8),
            num_devices=num_devices,
            log_interval=1,
            checkpoint_interval_epochs=10,  # skip ckpt io in this test
            work_dir=str(tmp_path),
        )
        return train_semi(cfg, ds)

    s1 = run(1, 8, "single")   # global batch 8 labeled + 16 unlabeled
    s8 = run(8, 1, "mesh8")    # same global batch over 8 devices

    assert int(s1.step) == int(s8.step) == 2
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(l1, l8)
    )
    assert worst <= 5 * lr, worst


def test_train_semi_two_processes(tmp_path):
    """REAL multi-process run of the production semi loop: 2 jax processes
    x 4 virtual CPU devices each, every process feeding its contiguous
    slice of the global [labeled; unlabeled] batch
    (jax.make_array_from_process_local_data). Asserts both processes end
    holding the IDENTICAL global model — SPMD consistency of the
    distributed data path (the reference's DDP surface, train.py:131-139)."""
    import socket
    import subprocess
    import sys
    from pathlib import Path

    # find a free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "helpers" / "multihost_worker.py"
    env = {k: v for k, v in __import__("os").environ.items()
           if k not in ("XLA_FLAGS",)}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    d0 = np.load(tmp_path / "params_p0.npz")
    d1 = np.load(tmp_path / "params_p1.npz")
    assert int(d0["step"]) == int(d1["step"]) == 2
    keys = [k for k in d0.files if k != "step"]
    assert keys
    for k in keys:
        np.testing.assert_array_equal(d0[k], d1[k])
