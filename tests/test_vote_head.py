"""Legacy VoteHead + bin coder tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.nn.pointnet2 import PointNet2SASSG
from nesie_tpu.nn.vote_head import VoteHead
from nesie_tpu.train.targets import get_targets
from nesie_tpu.train.votehead_loss import VoteHeadLossConfig, votehead_supervised_loss

C = 4
B, N = 2, 256


def _setup():
    import flax.linen as nn

    class Detector(nn.Module):
        @nn.compact
        def __call__(self, pts, sample_mod, rng, train=False):
            feat = PointNet2SASSG(
                in_channels=4,
                num_points=(64, 32, 16, 16),
                num_samples=(8, 8, 4, 4),
                sa_channels=((16, 16, 32),) + ((32, 32, 32),) * 3,
                fp_channels=((32, 32), (32, 32)),
            )(pts, train=train)
            return VoteHead(
                num_classes=C, num_sizes=C, num_proposal=16, seed_feat_dim=32
            )(feat, sample_mod, rng, train=train)

    model = Detector()
    rng = jax.random.PRNGKey(0)
    pts = jax.random.uniform(rng, (B, N, 4))
    variables = model.init({"params": rng}, pts, "vote", rng)
    return model, variables, pts


def test_vote_head_forward_and_decode():
    model, variables, pts = _setup()
    out = model.apply(variables, pts, "vote", jax.random.PRNGKey(1))
    assert out["obj_scores"].shape == (B, 16, 2)
    assert out["size_res"].shape == (B, 16, C, 3)

    from nesie_tpu.nn.vote_head import BinBoxCoder

    mean_sizes = np.ones((C, 3), np.float32)
    coder = BinBoxCoder(1, C, jnp.asarray(mean_sizes), with_rot=False)
    boxes = coder.decode(out["aggregated_points"], out)
    assert boxes.shape == (B, 16, 7)
    assert np.isfinite(np.asarray(boxes)).all()
    assert (np.asarray(boxes[..., 3:6]) >= 0.1 - 1e-6).all()


def test_vote_head_loss_finite():
    model, variables, pts = _setup()
    out = model.apply(variables, pts, "vote", jax.random.PRNGKey(1))
    r = np.random.RandomState(0)
    MG = 8
    gt_boxes = np.zeros((B, MG, 7), np.float32)
    gt_boxes[:, :2, :3] = r.uniform(0.2, 0.8, (B, 2, 3))
    gt_boxes[:, :2, 3:6] = 0.5
    gt_labels = np.zeros((B, MG), np.int32)
    gt_valid = np.zeros((B, MG), bool)
    gt_valid[:, :2] = True
    targets = get_targets(
        pts[..., :3], jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_valid), out["aggregated_points"],
    )
    total, terms = votehead_supervised_loss(
        out, targets, np.ones((C, 3), np.float32),
        VoteHeadLossConfig(num_classes=C),
    )
    assert np.isfinite(float(total))
    for k, v in terms.items():
        assert np.isfinite(float(v)), k
    assert "size_res_loss" in terms and "dir_class_loss" in terms
