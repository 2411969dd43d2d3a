"""End-to-end model smoke tests on a tiny config (CPU-friendly)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.train.targets import get_targets
from nesie_tpu.train.sup_loss import NesieLossConfig, nesie_supervised_loss

TINY = dict(
    num_classes=4,
    reg_max=8,
    num_proposal=16,
    num_points=(64, 32, 16, 16),
    radii=(0.2, 0.4, 0.8, 1.2),
    num_samples=(8, 8, 4, 4),
    sa_channels=((16, 16, 32), (32, 32, 32), (32, 32, 32), (32, 32, 32)),
    fp_channels=((32, 32), (32, 32)),
)
B, N = 2, 256


@pytest.fixture(scope="module")
def model_and_vars():
    model = VoteNetNesie(**TINY)
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (B, N, 4))
    variables = model.init(
        {"params": rng}, pts, "vote", rng, train=False
    )
    return model, variables, pts


def test_forward_shapes(model_and_vars):
    model, variables, pts = model_and_vars
    out = model.apply(variables, pts, "vote", jax.random.PRNGKey(1), train=False)
    P, C = TINY["num_proposal"], TINY["num_classes"]
    assert out["obj_scores"].shape == (B, P, 2)
    assert out["sem_scores"].shape == (B, P, C)
    assert out["bbox_preds"].shape == (B, P, 7)
    assert out["surface_pred"].shape == (B, P, 6)
    assert out["bbox_probs"].shape == (B, P, 6, TINY["reg_max"] + 1)
    assert out["iou_scores"].shape == (B, P, C)
    assert out["side_scores"].shape == (B, P, 6, C)
    assert out["side_scores_jitter"].shape == (B, P, 6, C)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"
    # surfaces consistent with decoded boxes
    np.testing.assert_allclose(
        np.asarray(out["bbox_preds"][..., :3]),
        np.asarray(
            (out["surface_pred"][..., :3] + out["surface_pred"][..., 3:]) / 2
        ),
        atol=1e-5,
    )


def test_seed_sample_mode(model_and_vars):
    model, variables, pts = model_and_vars
    out = model.apply(variables, pts, "seed", jax.random.PRNGKey(1), train=False)
    assert out["aggregated_points"].shape == (B, TINY["num_proposal"], 3)


def test_supervised_loss_and_grads(model_and_vars):
    model, variables, pts = model_and_vars
    rng = jax.random.PRNGKey(2)
    max_gt = 8
    gt_boxes = np.zeros((B, max_gt, 7), np.float32)
    gt_boxes[:, :3, :3] = np.random.RandomState(0).uniform(0.2, 0.8, (B, 3, 3))
    gt_boxes[:, :3, 3:6] = 0.4
    gt_labels = np.zeros((B, max_gt), np.int32)
    gt_labels[:, :3] = np.random.RandomState(1).randint(0, 4, (B, 3))
    gt_valid = np.zeros((B, max_gt), bool)
    gt_valid[:, :3] = True

    cfg = NesieLossConfig(num_classes=TINY["num_classes"])

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts,
            "vote",
            rng,
            train=True,
            mutable=["batch_stats"],
        )
        targets = get_targets(
            pts[..., :3],
            jnp.asarray(gt_boxes),
            jnp.asarray(gt_labels),
            jnp.asarray(gt_valid),
            out["aggregated_points"],
        )
        total, terms = nesie_supervised_loss(out, targets, cfg)
        return total, terms

    (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(total))
    for k, v in terms.items():
        assert np.isfinite(float(v)), f"non-finite loss term {k}"
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g**2) for g in leaves))
    )
    assert gnorm > 0


def test_eval_with_jitter_false_identical_main_outputs():
    """The with_jitter=False eval fast path must produce bit-identical
    main-proposal outputs (running-stat BN makes proposals independent;
    the jittered half only feeds training losses)."""
    import jax

    model = VoteNetNesie(**TINY)
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (2, 128, 4), jnp.float32)
    variables = model.init({"params": key}, pts, "seed", key, train=False)

    full = model.apply(variables, pts, "seed", jax.random.PRNGKey(7),
                       train=False)
    fast = model.apply(variables, pts, "seed", jax.random.PRNGKey(8),
                       train=False, with_jitter=False)
    for k in ("bbox_preds", "obj_scores", "sem_scores", "iou_scores",
              "side_scores", "surface_pred", "aggregated_points"):
        np.testing.assert_array_equal(np.asarray(full[k]), np.asarray(fast[k]))
    assert "iou_scores_jitter" not in fast
