"""Tests for the round-1 parity extras: MSG module, box modes, gaussian,
anchors, segmentor, consistency losses, utils."""
import numpy as np
import jax
import jax.numpy as jnp


def test_msg_module_shapes(rng):
    from nesie_tpu.nn.pointnet2 import PointSAModuleMSG

    m = PointSAModuleMSG(
        num_point=16,
        radii=(0.2, 0.4),
        sample_nums=(8, 16),
        mlp_channels=((16, 16), (16, 32)),
    )
    xyz = jnp.asarray(rng.uniform(size=(2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), xyz, feats)
    new_xyz, out, idx = m.apply(variables, xyz, feats)
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 16 + 32)  # concat of both scales
    assert idx.shape == (2, 16)


def test_box_mode_roundtrip(rng):
    from nesie_tpu.core.box_modes import (
        cam_to_depth, depth_to_cam, depth_to_lidar, lidar_to_depth,
    )

    b = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(lidar_to_depth(depth_to_lidar(b))), np.asarray(b), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(cam_to_depth(depth_to_cam(b))), np.asarray(b), atol=1e-6
    )


def test_convert_points_matches_reference_depth_lidar():
    from nesie_tpu.core.box_modes import convert_points

    p = jnp.asarray([[1.0, 2.0, 3.0, 9.0]])
    out = np.asarray(convert_points(p, "DEPTH", "LIDAR"))
    np.testing.assert_allclose(out[0], [2, -1, 3, 9])


def test_gaussian_heatmap():
    from nesie_tpu.core.gaussian import draw_heatmap_gaussian, gaussian_radius

    hm = jnp.zeros((16, 16))
    out = np.asarray(draw_heatmap_gaussian(hm, (8, 8), radius=2))
    assert out[8, 8] == out.max() > 0.99
    assert out[0, 0] == 0
    r = float(gaussian_radius((10.0, 10.0), 0.5))
    assert r > 0


def test_anchor_grid():
    from nesie_tpu.core.anchors import anchor_3d_range_grid

    a = anchor_3d_range_grid((1, 4, 4), (0, 0, -1, 4, 4, -1),
                             sizes=((1, 2, 1),), rotations=(0.0, 1.57))
    assert a.shape == (1 * 4 * 4 * 1 * 2, 7)
    assert np.asarray(a)[:, 2].max() == -1


def test_segmentor_forward(rng):
    from nesie_tpu.nn.segmentor import PointNet2Segmentor, segmentation_loss

    model = PointNet2Segmentor(
        num_classes=5,
        num_points=(32, 16, 8, 8),
        num_samples=(8, 8, 4, 4),
        sa_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
        fp_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
        head_channels=8,
    )
    pts = jnp.asarray(rng.uniform(size=(1, 128, 4)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts)
    logits = model.apply(variables, pts)
    assert logits.shape == (1, 128, 5)
    labels = jnp.asarray(rng.integers(0, 5, (1, 128)))
    loss = segmentation_loss(logits, labels)
    assert np.isfinite(float(loss))
    labels_ign = labels.at[0, :64].set(255)
    loss2 = segmentation_loss(logits, labels_ign, use_lovasz=True)
    assert np.isfinite(float(loss2))


def test_consistency_losses(rng):
    from nesie_tpu.losses.consistency import consistency_losses

    B, P, C = 2, 8, 4
    center = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    sem = jnp.asarray(rng.normal(size=(B, P, C)).astype(np.float32))
    size = jnp.abs(jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32)))
    total, terms = consistency_losses(
        center, sem, size, center, sem, size,
        flip_x=jnp.zeros(B, bool), flip_y=jnp.zeros(B, bool),
        rot_mat=jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        scale=jnp.ones((B, 1, 3)),
    )
    # identical student/teacher + identity aug -> ~zero consistency
    assert float(terms["center_consistency_loss"]) < 1e-6
    assert float(terms["size_consistency_loss"]) < 1e-6
    assert np.isfinite(float(total))


def test_utils_env_and_metrics(tmp_path):
    from nesie_tpu.utils import MetricsLogger, collect_env

    env = collect_env()
    assert "jax" in env
    m = MetricsLogger(tmp_path, use_tensorboard=False)
    m.log(1, {"loss": jnp.asarray(1.5)})
    m.close()
    import json

    row = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert row["loss"] == 1.5


def test_base_conv_bbox_head_branches():
    """BaseConvBboxHead (reference base_conv_bbox_head.py): shared trunk
    then separate cls/reg branches, each an independent 1x1 conv stack."""
    import jax
    import jax.numpy as jnp
    from nesie_tpu.nn import BaseConvBboxHead

    head = BaseConvBboxHead(
        shared_conv_channels=(32, 32),
        cls_conv_channels=(16,),
        reg_conv_channels=(),
        num_cls_out=5,
        num_reg_out=7,
    )
    x = jnp.ones((2, 64, 24))
    vars_ = head.init(jax.random.PRNGKey(0), x)
    cls_out, reg_out = head.apply(vars_, x)
    assert cls_out.shape == (2, 64, 5)
    assert reg_out.shape == (2, 64, 7)
    params = vars_["params"]
    assert "cls_convs" in params and "reg_convs" not in params
    assert {"shared", "conv_cls", "conv_reg"} <= set(params)
