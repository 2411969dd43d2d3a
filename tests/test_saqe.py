"""SAQE head forward + loss smoke tests (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.nn.heads import angle_integral_expectation
from nesie_tpu.train.saqe_loss import (
    SAQELossConfig,
    saqe_supervised_loss,
    saqe_unsup_loss,
)
from nesie_tpu.train.targets import get_targets

C = 4
TINY = dict(
    num_classes=C,
    reg_max=8,
    num_proposal=16,
    head="saqe",
    jitter_scale=0.5,
    jitter_size_bias=0.2,
    num_points=(64, 32, 16, 16),
    radii=(0.2, 0.4, 0.8, 1.2),
    num_samples=(8, 8, 4, 4),
    sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
    fp_channels=((32, 32), (32, 32)),
)
B, N = 2, 256


def test_angle_integral_range():
    logits = jnp.asarray(np.random.RandomState(0).randn(10, 12).astype(np.float32))
    ang = np.asarray(angle_integral_expectation(logits))
    assert (ang > -np.pi).all() and (ang <= np.pi + 1e-6).all()
    # peaked distribution at bin 0 -> angle ~0
    peaked = jnp.zeros((1, 12)).at[0, 0].set(50.0)
    np.testing.assert_allclose(
        np.asarray(angle_integral_expectation(peaked))[0], 0.0, atol=1e-3
    )


@pytest.fixture(scope="module")
def saqe_setup():
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (B, N, 4))
    variables = model.init({"params": rng}, pts, "vote", rng, train=False)
    return model, variables, pts


def test_saqe_forward_shapes(saqe_setup):
    model, variables, pts = saqe_setup
    out = model.apply(variables, pts, "vote", jax.random.PRNGKey(1), train=False)
    P = TINY["num_proposal"]
    assert out["bbox_preds"].shape == (B, P, 7)
    assert out["rotate_scores"].shape == (B, P, C)
    assert out["R_obj_scores"].shape == (B, P, 2)
    assert out["jitter_surface_preds"].shape == (B, P, 6)
    # learned-scale decode: surface scales positive
    assert (np.asarray(out["surface_scale"]) > 0).all()
    # decoded heading within (-pi, pi]
    h = np.asarray(out["bbox_preds"][..., 6])
    assert (h > -np.pi - 1e-5).all() and (h <= np.pi + 1e-5).all()
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_saqe_losses_finite(saqe_setup):
    model, variables, pts = saqe_setup
    rng = jax.random.PRNGKey(2)
    out, _ = model.apply(
        variables, pts, "vote", rng, train=True, mutable=["batch_stats"]
    )
    max_gt = 8
    r = np.random.RandomState(0)
    gt_boxes = np.zeros((B, max_gt, 7), np.float32)
    gt_boxes[:, :3, :3] = r.uniform(0.2, 0.8, (B, 3, 3))
    gt_boxes[:, :3, 3:6] = 0.4
    gt_labels = np.zeros((B, max_gt), np.int32)
    gt_valid = np.zeros((B, max_gt), bool)
    gt_valid[:, :3] = True
    targets = get_targets(
        pts[..., :3],
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_labels),
        jnp.asarray(gt_valid),
        out["aggregated_points"],
    )
    cfg = SAQELossConfig(num_classes=C)
    for phase in ("pretrain", "semi"):
        total, terms = saqe_supervised_loss(out, targets, cfg, phase=phase)
        assert np.isfinite(float(total)), phase
        assert "angle_loss" in terms
        # the self-distilled angle quality trains in PRETRAIN only: the
        # semi sup_loss (saqe_head.py:524-705) never returns an
        # angle_pred term (pinned numerically in test_reference_oracle3)
        assert ("angle_pred_loss" in terms) == (phase == "pretrain")
        for k, v in terms.items():
            assert np.isfinite(float(v)), (phase, k)

    quality = jnp.ones((B, max_gt, 6)) * 0.5
    total_u, terms_u = saqe_unsup_loss(out, targets, quality, cfg)
    assert np.isfinite(float(total_u))
    assert set(terms_u) == {
        "unsup_center_loss", "unsup_semantic_loss",
        "unsup_iou_loss", "unsup_surface_loss",
    }
