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


def test_anchor_generator_matches_torch_reference_port():
    """Oracle: a literal torch port of the reference's
    anchors_single_range (anchor_3d_generator.py:147-211 plain,
    :243-328 aligned) — checks meshgrid order, permute layout, per-size
    ranges and the half-cell aligned shift."""
    import torch

    from nesie_tpu.core.anchors import (
        AlignedAnchor3DRangeGenerator,
        Anchor3DRangeGenerator,
    )

    def torch_single_range(feature_size, anchor_range, scale, sizes,
                           rotations, aligned, align_corner=False):
        anchor_range = torch.tensor(anchor_range)
        n_extra = 1 if aligned else 0
        z = torch.linspace(anchor_range[2], anchor_range[5],
                           feature_size[0] + n_extra)
        y = torch.linspace(anchor_range[1], anchor_range[4],
                           feature_size[1] + n_extra)
        x = torch.linspace(anchor_range[0], anchor_range[3],
                           feature_size[2] + n_extra)
        if aligned and not align_corner:
            z = z + (z[1] - z[0]) / 2
            y = y + (y[1] - y[0]) / 2
            x = x + (x[1] - x[0]) / 2
        if aligned:
            z, y, x = (z[:feature_size[0]], y[:feature_size[1]],
                       x[:feature_size[2]])
        sizes = torch.tensor(sizes).reshape(-1, 3) * scale
        rotations = torch.tensor(rotations)
        rets = list(torch.meshgrid(x, y, z, rotations, indexing="ij"))
        tile_shape = [1] * 5
        tile_shape[-2] = int(sizes.shape[0])
        for i in range(len(rets)):
            rets[i] = rets[i].unsqueeze(-2).repeat(tile_shape).unsqueeze(-1)
        sizes = sizes.reshape([1, 1, 1, -1, 1, 3])
        tile_size_shape = list(rets[0].shape)
        tile_size_shape[3] = 1
        sizes = sizes.repeat(tile_size_shape)
        rets.insert(3, sizes)
        return torch.cat(rets, dim=-1).permute([2, 1, 0, 3, 4, 5])

    ranges = [[0, -40, -3, 70, 40, 1], [0, -40, -1.8, 70, 40, 2.2]]
    sizes = [[1.6, 3.9, 1.56], [0.6, 0.8, 1.73]]
    fs = (2, 4, 5)

    for cls, aligned in ((Anchor3DRangeGenerator, False),
                         (AlignedAnchor3DRangeGenerator, True)):
        gen = cls(ranges=ranges, sizes=sizes, rotations=[0, 1.5707963])
        got = np.asarray(gen.grid_anchors([fs])[0])
        want = torch.cat(
            [torch_single_range(fs, r, 1, [s], [0, 1.5707963], aligned)
             for r, s in zip(ranges, sizes)],
            dim=-3,
        ).reshape(-1, 7).numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_anchor_generator_per_cls_layout():
    from nesie_tpu.core.anchors import AlignedAnchor3DRangeGeneratorPerCls

    gen = AlignedAnchor3DRangeGeneratorPerCls(
        ranges=[[0, 0, -1, 8, 8, 1], [0, 0, -1, 4, 4, 1]],
        sizes=[[1, 1, 1], [2, 2, 2]],
        rotations=[0.0, 1.5707963],
    )
    per_cls = gen.grid_anchors([[(1, 4, 4), (1, 2, 2)]][0])
    assert len(per_cls) == 1  # one level
    a0, a1 = per_cls[0]
    assert a0.shape == (1 * 4 * 4 * 2, 7)  # S*R*prod(fs), base-anchor-major
    assert a1.shape == (1 * 2 * 2 * 2, 7)
    # base-anchor-major: first half all rotation 0, second half rot ~pi/2
    np.testing.assert_allclose(np.asarray(a0)[:16, 6], 0.0)
    np.testing.assert_allclose(np.asarray(a0)[16:, 6], 1.5707963, rtol=1e-6)


def test_image_projection_vis(tmp_path):
    from nesie_tpu.eval.visualize import draw_bbox3d_on_img, project_pts_on_img

    img = np.zeros((64, 64, 3), np.uint8)
    # camera looking along +z: simple pinhole projection matrix
    proj = np.array(
        [[50, 0, 32, 0], [0, 50, 32, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32,
    )
    pts = np.array([[0.0, 0.0, 2.0], [0.1, 0.1, 3.0]], np.float32)
    out = project_pts_on_img(pts, img, proj)
    assert out.shape == img.shape and out.sum() > 0

    boxes = np.array([[0, 0, 3.0, 0.5, 0.5, 0.5, 0.2]], np.float32)
    out2 = draw_bbox3d_on_img(boxes, img, proj)
    assert out2.sum() > 0


def test_segmentor_aux_head_and_loss(rng):
    import jax
    from nesie_tpu.nn.segmentor import PointNet2Segmentor, encoder_decoder_loss

    model = PointNet2Segmentor(
        num_classes=5,
        with_aux=True,
        num_points=(32, 16, 8, 8),
        num_samples=(8, 8, 4, 4),
        sa_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
        fp_channels=((8, 8), (8, 8), (8, 8), (8, 8)),
        head_channels=8,
        dropout=0.0,
    )
    pts = jnp.asarray(rng.uniform(size=(2, 64, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, (2, 64)).astype(np.int32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, pts)
    out = model.apply(variables, pts)
    assert out["seg_logits"].shape == (2, 64, 5)
    assert out["aux_logits"].shape[0] == 2 and out["aux_logits"].shape[-1] == 5
    assert out["aux_indices"].shape == out["aux_logits"].shape[:2]

    def lf(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, pts
        )
        return encoder_decoder_loss(o, labels)

    loss, grads = jax.value_and_grad(lf)(variables["params"])
    assert np.isfinite(float(loss))
    # the aux head must receive gradient (deep supervision is live)
    g = jax.tree_util.tree_leaves(grads["aux_cls"])
    assert sum(float(jnp.abs(x).sum()) for x in g) > 0


def test_slide_inference_covers_and_averages(rng):
    from nesie_tpu.nn.segmentor import slide_inference

    N, C = 500, 4
    pts = rng.uniform(0, 4, (N, 3)).astype(np.float32)
    feats = rng.normal(size=(N, 2)).astype(np.float32)
    scene = np.concatenate([pts, feats], 1)

    # constant-logits model: averaging over overlapping patches must
    # return exactly that constant for every point
    const = np.arange(C, dtype=np.float32)

    def apply_fn(batch):
        return np.broadcast_to(const, batch.shape[:2] + (C,))

    out = slide_inference(scene, apply_fn, num_points=64, block_size=2.0,
                          sample_rate=0.5, batch_size=3)
    assert out.shape == (N, C)
    np.testing.assert_allclose(out, np.broadcast_to(const, (N, C)), rtol=1e-6)

    # patch-centered coords: every patch's point x/y must be within the
    # block around 0 (checks the center subtraction)
    seen = []

    def apply_fn2(batch):
        seen.append(np.abs(batch[..., :2]).max())
        return np.zeros(batch.shape[:2] + (C,), np.float32)

    slide_inference(scene, apply_fn2, num_points=64, block_size=2.0)
    assert max(seen) <= 1.0 + 1e-3


def test_cfg_override_lowercase_bools():
    """'false' from a shell must never become a truthy string
    (apply_overrides maps true/false case-insensitively to bools)."""
    from nesie_tpu.config import apply_overrides, get_config

    cfg = get_config("nesie-votenet-scannet-train-010")
    cfg = apply_overrides(cfg, [
        "pseudo.literal_reference_cbl=false",
        "teacher_jitter=true",
        "test.iou_opt=False",
    ])
    assert cfg.pseudo.literal_reference_cbl is False
    assert cfg.teacher_jitter is True
    assert cfg.test.iou_opt is False
