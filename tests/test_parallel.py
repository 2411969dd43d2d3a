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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_semi_step_gradients_match_single_device():
    """Tight per-step GRADIENT equivalence for the full semi step: with
    plain SGD(lr=1) the parameter delta IS the gradient, so sharded vs
    single-device deltas compare the gradients directly at float32
    reduction-noise tolerance (no Adam sign-amplification slack)."""
    import optax

    from nesie_tpu.data.augment import AugParams
    from nesie_tpu.train.pseudo_label import PseudoLabelConfig
    from nesie_tpu.train.semi import UlbState, make_semi_train_step

    B, N = 8, 128  # 4 labeled + 4 unlabeled... (n_labeled=4 below)
    r = np.random.RandomState(1)
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    pts = jnp.asarray(r.uniform(size=(B, N, 4)).astype(np.float32))
    variables = model.init({"params": rng}, pts, "vote", rng)
    tx = optax.sgd(1.0)
    step = make_semi_train_step(
        model, tx, n_labeled=4, num_labeled_scans=8,
        loss_cfg=NesieLossConfig(num_classes=C),
        # permissive thresholds so pseudo labels actually flow through the
        # unsup-loss gradients being compared
        pl_cfg=PseudoLabelConfig(num_classes=C, max_num_obj=8,
                                 cls_thr_base=-1e9, obj_thr=0.0,
                                 iou_thr_base=-1.0),
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jnp.asarray(r.uniform(size=(B, N, 4)).astype(np.float32)),
        gt_boxes=jnp.zeros((B, 8, 7))
        .at[:, :2, 3:6].set(0.5)
        .at[:, :2, :3].set(jnp.asarray(r.uniform(0.2, 0.8, (B, 2, 3)))),
        gt_labels=jnp.zeros((B, 8), jnp.int32),
        gt_valid=jnp.zeros((B, 8), bool).at[:, :2].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.arange(B, dtype=jnp.int32) % 16,
    )

    def fresh():
        return create_train_state(jax.tree.map(jnp.copy, variables), tx)

    ulb = UlbState.create(16, C)
    s1, u1, m1 = step(fresh(), ulb, batch, jax.random.PRNGKey(3))

    mesh = make_mesh(8)
    state2 = replicate(fresh(), mesh)
    ulb2 = replicate(UlbState.create(16, C), mesh)
    sharded = shard_batch(batch, mesh)
    with mesh:
        s2, u2, m2 = step(state2, ulb2, sharded, jax.random.PRNGKey(3))

    assert float(m1["num_pseudo"]) >= 16
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(u1.ulb_list),
                                  np.asarray(u2.ulb_list))

    flat1 = jax.tree_util.tree_flatten_with_path(s1.params)[0]
    flat2 = jax.tree_util.tree_leaves(s2.params)
    base = jax.tree_util.tree_leaves(variables["params"])
    grads1 = [np.asarray(a) - np.asarray(p0)  # = -grad (sgd lr 1)
              for (_, a), p0 in zip(flat1, base)]
    grads2 = [np.asarray(b) - np.asarray(p0) for b, p0 in zip(flat2, base)]
    global_scale = max(float(np.max(np.abs(g))) for g in grads1)
    errs = []
    for (path, _), g1, g2 in zip(flat1, grads1, grads2):
        # f32 reduction-order noise (psum tree vs single-device sum) gets
        # amplified through the global-batch BN normalizations, and the
        # quality module's max-pools can flip subgradient routing between
        # near-tied grid points — measured worst leaf ~1e-6 of the global
        # gradient scale, median relative error ~1e-5. The absolute floor
        # (1e-5 of the largest gradient entry anywhere) covers tie flips
        # and leaves whose true gradient is numerically zero (e.g. a dense
        # bias immediately followed by BN).
        leaf_scale = max(float(np.max(np.abs(g1))), 1e-8)
        diff = float(np.max(np.abs(g1 - g2)))
        tol = max(2e-3 * leaf_scale, 1e-5 * global_scale)
        assert diff <= tol, (jax.tree_util.keystr(path), diff, tol)
        errs.append(diff / max(leaf_scale, 1e-5 * global_scale))
    # measured median ~1.4e-4 (f32 noise through three BN stacks)
    assert float(np.median(errs)) <= 5e-4, float(np.median(errs))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_eval_path_sharded_matches_single_device():
    """The tools/test.py eval path (replicated state + shard_host_batch +
    eval forward + decode_and_nms) must produce the same detections on an
    8-device mesh as on one device."""
    from nesie_tpu.eval import decode_and_nms
    from nesie_tpu.parallel import shard_host_batch
    from nesie_tpu.train.state import create_train_state
    from nesie_tpu.train.step import make_eval_forward

    B, N = 8, 256
    r = np.random.RandomState(7)
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    pts_np = r.uniform(size=(B, N, 4)).astype(np.float32)
    variables = model.init({"params": rng}, jnp.asarray(pts_np), "seed", rng)
    tx = make_optimizer(make_lr_schedule(1e-3, 10))
    fwd = make_eval_forward(model, "seed")

    def run(mesh_size):
        mesh = make_mesh(mesh_size)
        state = replicate(
            create_train_state(jax.tree.map(jnp.copy, variables), tx), mesh)
        points = shard_host_batch(pts_np, mesh)
        out = fwd(state, points, jax.random.PRNGKey(5))
        decoded = decode_and_nms(out, points, nms_thr=0.25, score_thr=0.0)
        return jax.tree.map(np.asarray, decoded)

    d1 = run(1)
    d8 = run(8)
    assert set(d1) == set(d8)
    for k in d1:
        if d1[k].dtype == bool or np.issubdtype(d1[k].dtype, np.integer):
            np.testing.assert_array_equal(d1[k], d8[k], err_msg=k)
        else:
            np.testing.assert_allclose(d8[k], d1[k], rtol=1e-5, atol=1e-5,
                                       err_msg=k)


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
