"""Numerical regression guards: key pipeline values on fixed fixtures.

These pin the *semantics* of the loss/target/pseudo-label stack so kernel
optimizations can't silently change training math. Reference values were
captured from the initial verified implementation (first run prints the
values; they are asserted with tight tolerances thereafter).
"""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.core.iou import iou3d
from nesie_tpu.losses import quality_focal_loss, surface_loss_mse
from nesie_tpu.losses.chamfer import chamfer_distance
from nesie_tpu.ops import ball_query, furthest_point_sample
from nesie_tpu.train.pseudo_label import quality_poly
from nesie_tpu.train.sup_loss import sigma_poly
from nesie_tpu.train.targets import get_targets


def _fix(shape, seed=0, lo=0.0, hi=1.0):
    r = np.random.RandomState(seed)
    return jnp.asarray((lo + (hi - lo) * r.rand(*shape)).astype(np.float32))


def test_fps_fixture():
    xyz = _fix((1, 64, 3), seed=1)
    idx = np.asarray(furthest_point_sample(xyz, 8))[0]
    np.testing.assert_array_equal(idx[:3], [0, 35, 13])  # pinned


def test_ball_query_fixture():
    xyz = _fix((1, 64, 3), seed=2)
    idx = np.asarray(ball_query(xyz, xyz[:, :4], 0.3, 4))[0]
    # neighbors come in source-index order; each center appears in its own
    # neighborhood (d2 == 0 rule), pinned from the verified implementation
    np.testing.assert_array_equal(idx[:, 0], [0, 1, 2, 2])
    for c in range(4):
        assert c in idx[c]


def test_iou3d_fixture():
    a = jnp.asarray([[0.1, 0.2, 0.3, 1.0, 1.2, 0.8, 0.3]])
    b = jnp.asarray([[0.0, 0.0, 0.2, 1.1, 1.0, 0.9, -0.2]])
    np.testing.assert_allclose(float(iou3d(a, b)[0]), 0.47963, atol=2e-3)


def test_sigma_quality_polys():
    s = jnp.asarray([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(sigma_poly(s)), [1.0, 0.3, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quality_poly(s)), [1.0, 1 / 12, 0.0], atol=1e-6
    )


def test_qfl_fixture():
    pred = jnp.asarray([[0.2, 0.7], [0.9, 0.1]])
    label = jnp.asarray([1, 0])
    score = jnp.asarray([0.8, 0.5])
    loss = np.asarray(
        quality_focal_loss(pred, label, score, beta=2.0, use_sigmoid=False)
    )
    # hand-checked: bce(0.2,0)*0.04 + bce(0.7,0.8)*|0.1|^2 ;
    #               bce(0.9,0.5)*0.16 + bce(0.1,0)*0.01
    want0 = (-np.log(0.8)) * 0.04 + (
        -(0.8 * np.log(0.7) + 0.2 * np.log(0.3))
    ) * 0.01
    want1 = (-(0.5 * np.log(0.9) + 0.5 * np.log(0.1))) * 0.16 + (
        -np.log(0.9)
    ) * 0.01
    np.testing.assert_allclose(loss, [want0, want1], rtol=1e-5)


def test_chamfer_fixture():
    src = _fix((1, 4, 3), seed=3)
    dst = _fix((1, 6, 3), seed=4)
    s2d, d2s, i1, i2 = chamfer_distance(src, dst)
    assert float(jnp.sum(s2d) + jnp.sum(d2s)) > 0
    # argmin indices are within range and stable
    assert np.asarray(i1).max() < 6 and np.asarray(i2).max() < 4


def test_targets_fixture_weights_sum():
    pts = _fix((2, 128, 3), seed=5, lo=-2, hi=2)
    boxes = np.zeros((2, 8, 7), np.float32)
    boxes[:, :2, 3:6] = 1.0
    boxes[0, 0, :3] = [0.5, 0.5, -0.5]
    boxes[1, 0, :3] = [-0.5, -0.5, -0.5]
    boxes[:, 1, :3] = [1.5, 1.5, -0.5]
    valid = np.zeros((2, 8), bool)
    valid[:, :2] = True
    agg = _fix((2, 16, 3), seed=6, lo=-2, hi=2)
    t = get_targets(
        pts, jnp.asarray(boxes), jnp.zeros((2, 8), jnp.int32),
        jnp.asarray(valid), agg,
    )
    np.testing.assert_allclose(float(jnp.sum(t.objectness_weights)), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(t.valid_gt_weights)), 1.0, atol=1e-5)
    if float(jnp.sum(t.objectness_targets)) > 0:
        np.testing.assert_allclose(
            float(jnp.sum(t.box_loss_weights)), 1.0, atol=1e-5
        )
    # surface loss of zero-size prediction against itself is zero
    sp = jnp.zeros((4, 6))
    tb = jnp.zeros((4, 7))
    np.testing.assert_allclose(np.asarray(surface_loss_mse(sp, tb)), 0.0)


def test_semi_step_loss_pinned():
    """Pin the full semi-supervised step's loss on a fixed tiny batch so
    future kernel/loss optimizations that claim numerics-preservation are
    held to it (VERDICT r1 item 4)."""
    import jax
    import jax.numpy as jnp

    from nesie_tpu.data.augment import AugParams
    from nesie_tpu.nn.detector import VoteNetNesie
    from nesie_tpu.train.pseudo_label import PseudoLabelConfig
    from nesie_tpu.train.semi import UlbState, make_semi_train_step
    from nesie_tpu.train.state import (
        create_train_state, make_lr_schedule, make_optimizer,
    )
    from nesie_tpu.train.sup_loss import NesieLossConfig

    C = 18
    model = VoteNetNesie(
        num_classes=C, reg_max=8, num_proposal=16,
        num_points=(64, 32, 16, 16), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
        fp_channels=((32, 32), (32, 32)),
    )
    rng = jax.random.PRNGKey(0)
    B, N, MAX_GT = 4, 256, 8
    pts = jax.random.uniform(rng, (B, N, 4), jnp.float32)
    variables = model.init({"params": rng}, pts, "vote", rng, train=False)
    tx = make_optimizer(make_lr_schedule(8e-3, 100))
    state = create_train_state(variables, tx)
    ulb_state = UlbState.create(num_unlabeled=16, num_classes=C)
    step = make_semi_train_step(
        model, tx, n_labeled=2, num_labeled_scans=16,
        loss_cfg=NesieLossConfig(num_classes=C),
        pl_cfg=PseudoLabelConfig(num_classes=C, max_num_obj=8),
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1), (B, N, 4)),
        gt_boxes=jnp.zeros((B, MAX_GT, 7))
        .at[:, :2, 3:6].set(0.5).at[:, :2, :3].set(0.4),
        gt_labels=jnp.zeros((B, MAX_GT), jnp.int32),
        gt_valid=jnp.zeros((B, MAX_GT), bool).at[:, :2].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.arange(B, dtype=jnp.int32) % 16,
    )
    _, _, metrics = step(state, ulb_state, batch, jax.random.PRNGKey(3))
    print("semi pinned loss:", float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), PINNED_SEMI_LOSS,
                               rtol=1e-4)


PINNED_SEMI_LOSS = 85.87069702148438  # recorded on CPU, jax 0.9.0
