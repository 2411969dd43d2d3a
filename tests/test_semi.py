"""Semi-supervised step integration tests (tiny model, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.data.augment import AugParams
from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.train.pseudo_label import (
    PseudoLabelConfig,
    classwise_acc,
    get_pseudo_labels,
    lhs_nms_keep_mask,
    quality_poly,
)
from nesie_tpu.train.semi import UlbState, make_semi_train_step
from nesie_tpu.train.state import create_train_state, make_lr_schedule, make_optimizer
from nesie_tpu.train.sup_loss import NesieLossConfig

C = 4
TINY = dict(
    num_classes=C,
    reg_max=8,
    num_proposal=16,
    num_points=(64, 32, 16, 16),
    radii=(0.2, 0.4, 0.8, 1.2),
    num_samples=(8, 8, 4, 4),
    sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
    fp_channels=((32, 32), (32, 32)),
)


def test_lhs_nms_keeps_half_of_cluster():
    # 5 identical boxes, same class: pick best, suppress 4, keep top 2 of them
    boxes = np.tile(np.array([[0, 0, 0, 1, 1, 1]], np.float32), (5, 1))
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    classes = np.zeros(5, np.int32)
    keep = np.asarray(
        lhs_nms_keep_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes), 0.25)
    )
    np.testing.assert_array_equal(keep, [True, True, True, False, False])


def test_classwise_acc_range():
    ulb = jnp.asarray(np.random.RandomState(0).poisson(3, (10, C)).astype(np.float32))
    flag = jnp.zeros((10,))
    acc = np.asarray(classwise_acc(ulb, flag, num_labeled=5, thresh_warmup=True))
    assert (acc >= 0).all() and (acc <= 1).all()
    # most frequent class has the max acc
    counts = np.asarray(ulb).sum(0)
    assert np.argmax(acc) == np.argmax(counts)


def test_quality_poly_endpoints():
    np.testing.assert_allclose(float(quality_poly(jnp.asarray(0.0))), 1.0)
    np.testing.assert_allclose(float(quality_poly(jnp.asarray(1.0))), 0.0, atol=1e-6)


def test_semi_step_runs_and_updates():
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    n_labeled, ratio, N, MAX_GT = 1, 2, 128, 8
    B = n_labeled * (1 + ratio)
    pts = jax.random.uniform(rng, (B, N, 4))
    variables = model.init({"params": rng}, pts, "vote", rng, train=False)
    tx = make_optimizer(make_lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)
    ulb_state = UlbState.create(num_unlabeled=6, num_classes=C)

    step = make_semi_train_step(
        model,
        tx,
        n_labeled=n_labeled,
        num_labeled_scans=3,
        loss_cfg=NesieLossConfig(num_classes=C),
        pl_cfg=PseudoLabelConfig(num_classes=C, max_num_obj=8),
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1), (B, N, 4)),
        gt_boxes=jnp.zeros((B, MAX_GT, 7)).at[:, :2, 3:6].set(0.5).at[:, :2, :3].set(0.4),
        gt_labels=jnp.zeros((B, MAX_GT), jnp.int32),
        gt_valid=jnp.zeros((B, MAX_GT), bool).at[:, :2].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.asarray([0, 3, 5], jnp.int32),
    )
    # snapshot before the step: donate_argnums consumes state's buffers
    params_before = jax.tree.map(np.asarray, variables["params"])
    new_state, new_ulb, metrics = step(state, ulb_state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params actually changed
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - jnp.asarray(b)).sum()),
        new_state.params,
        params_before,
    )
    assert sum(jax.tree_util.tree_leaves(diffs)) > 0
    # visited unlabeled scans are flagged
    flag = np.asarray(new_ulb.ulb_flag)
    assert flag[3] == 0 and flag[5] == 0 and flag[1] == 1
    assert int(new_state.step) == 1


def test_ema_update_warmup_and_bn_stats_modes():
    """ema_update: the reference warm-up rule m=min(m0,(1+t)/(w+t)) on
    parameters, shared vs EMA'd batch_stats (ema_bn_stats)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nesie_tpu.train.state import TrainState, ema_update

    params = {"w": jnp.ones((3,))}
    stats = {"bn": {"mean": jnp.full((3,), 2.0)}}
    state = TrainState(
        step=jnp.asarray(5, jnp.int32),
        params={"w": jnp.full((3,), 3.0)},
        batch_stats=stats,
        ema_params=params,
        ema_batch_stats={"bn": {"mean": jnp.zeros((3,))}},
        opt_state=(),
    )
    m = min(1e-3, (1 + 5) / (10 + 5))
    out = ema_update(state, 1e-3, 10.0)
    np.testing.assert_allclose(out.ema_params["w"],
                               (1 - m) * 1.0 + m * 3.0, rtol=1e-6)
    # default: teacher stats mirror the student's (reference sharing)
    np.testing.assert_allclose(out.ema_batch_stats["bn"]["mean"], 2.0)

    out2 = ema_update(state, 1e-3, 10.0, ema_bn_stats=True)
    np.testing.assert_allclose(out2.ema_batch_stats["bn"]["mean"],
                               (1 - m) * 0.0 + m * 2.0, rtol=1e-6)
    # warm-up clamp: early steps use (1+t)/(w+t) when smaller... m0 is
    # already the min here; with a large m0 the ramp applies
    out3 = ema_update(state._replace(step=jnp.asarray(0, jnp.int32)), 0.9,
                      10.0)
    np.testing.assert_allclose(out3.ema_params["w"],
                               0.9 * 1.0 + 0.1 * 3.0, rtol=1e-6)


def test_train_semi_warns_on_zero_pseudo_epoch(tmp_path, caplog):
    """A whole epoch with zero accepted pseudo-labels silently degenerates
    to labeled-only training (CLAUDE.md); the runner must WARN and report
    the per-epoch pseudo/step means via run_stats (VERDICT r4 item 4)."""
    import dataclasses
    import logging

    from nesie_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        OptimConfig,
    )
    from nesie_tpu.data.dataset import SimiScanNetScenes
    from nesie_tpu.data.synthetic import make_synthetic_scenes
    from nesie_tpu.train.runner import train_semi

    scenes = make_synthetic_scenes(
        8, seed=3, num_classes=C, points_per_object=80, floor_points=400
    )
    ds = SimiScanNetScenes(
        scenes=scenes, labeled_ids=[s.scene_id for s in scenes], ratio=1
    )
    cfg = ExperimentConfig(
        name="semi-zero-pseudo",
        mode="semi",
        model=ModelConfig(**TINY),
        optim=OptimConfig(lr=1e-3, max_epochs=1, lr_milestones=(100,)),
        data=DataConfig(samples_per_step=4, repeat=1, num_points=256),
        loss=NesieLossConfig(num_classes=C),
        # obj_thr > 1 is unreachable for a sigmoid score: no pseudo-label
        # can ever pass, so the epoch must trip the zero-pseudo alarm
        pseudo=PseudoLabelConfig(num_classes=C, max_num_obj=8, obj_thr=1.5),
        num_devices=1,
        log_interval=100,
        checkpoint_interval_epochs=10,
        work_dir=str(tmp_path),
    )
    stats = {}
    with caplog.at_level(logging.WARNING, logger="nesie_tpu"):
        train_semi(cfg, ds, run_stats=stats)
    assert stats["num_pseudo_per_step"] == [0.0]
    assert stats["num_pseudo_mean"] == 0.0
    assert any("ZERO pseudo-labels" in r.message for r in caplog.records)
