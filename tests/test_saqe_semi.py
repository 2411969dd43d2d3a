"""SAQE semi-supervised step + SUN RGB-D prep tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nesie_tpu.data.augment import AugParams
from nesie_tpu.nn.detector import VoteNetNesie
from nesie_tpu.train.pseudo_label import PseudoLabelConfig
from nesie_tpu.train.saqe_loss import SAQELossConfig
from nesie_tpu.train.semi import UlbState, make_semi_train_step
from nesie_tpu.train.state import create_train_state, make_lr_schedule, make_optimizer

C = 4


def test_saqe_semi_step_runs():
    model = VoteNetNesie(
        num_classes=C, reg_max=8, num_proposal=16, head="saqe",
        jitter_scale=0.5, jitter_size_bias=0.2,
        num_points=(64, 32, 16, 16), num_samples=(8, 8, 4, 4),
        sa_channels=((16, 16, 32),) + ((32, 32, 32),) * 3,
        fp_channels=((32, 32), (32, 32)),
    )
    rng = jax.random.PRNGKey(0)
    B, N, MG = 3, 128, 8
    pts = jax.random.uniform(rng, (B, N, 4))
    variables = model.init({"params": rng}, pts, "vote", rng)
    tx = make_optimizer(make_lr_schedule(1e-3, 10))
    state = create_train_state(variables, tx)
    ulb = UlbState.create(6, C)
    step = make_semi_train_step(
        model, tx, n_labeled=1, num_labeled_scans=3,
        loss_cfg=SAQELossConfig(num_classes=C),
        pl_cfg=PseudoLabelConfig(num_classes=C, max_num_obj=8),
        head="saqe",
    )
    batch = dict(
        points_raw_s=pts,
        points_raw_t=jax.random.uniform(jax.random.PRNGKey(1), (B, N, 4)),
        gt_boxes=jnp.zeros((B, MG, 7)).at[:, :2, 3:6].set(0.5),
        gt_labels=jnp.zeros((B, MG), jnp.int32),
        gt_valid=jnp.zeros((B, MG), bool).at[:, :2].set(True),
        aug_s=AugParams.sample(jax.random.PRNGKey(2), (B,)),
        aug_t=AugParams.identity((B,)),
        ulb_scan_idx=jnp.asarray([0, 2, 4], jnp.int32),
    )
    new_state, new_ulb, metrics = step(state, ulb, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert "angle_loss" in metrics and "unsup_surface_loss" in metrics


def test_sunrgbd_prep_label_and_calib(tmp_path):
    from nesie_tpu.data import sunrgbd_prep

    (tmp_path / "calib").mkdir()
    (tmp_path / "label").mkdir()
    (tmp_path / "depth").mkdir()
    rt = np.eye(3)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    # files store matrices column-major (matlab reshape convention)
    (tmp_path / "calib" / "000001.txt").write_text(
        " ".join(str(v) for v in rt.T.reshape(-1)) + "\n"
        + " ".join(str(v) for v in K.T.reshape(-1))
    )
    (tmp_path / "label" / "000001.txt").write_text(
        "bed 1 2 3 4 0.5 1.5 0.3 0.4 0.6 0.25 1.0 0.0\n"
        "unknown_class 1 2 3 4 0 0 0 1 1 1 1 0\n"
    )
    pts = np.random.default_rng(0).normal(size=(200, 3)).astype(np.float32)
    np.save(tmp_path / "depth" / "000001.npy", pts)

    s = sunrgbd_prep.export_sample(tmp_path, "000001")
    assert s["points"].shape == (200, 3)
    assert len(s["boxes"]) == 1  # unknown class skipped
    box = s["boxes"][0]
    np.testing.assert_allclose(box[:3], [0.5, 1.5, 0.3], atol=1e-6)
    np.testing.assert_allclose(box[3:6], [0.8, 1.2, 0.5], atol=1e-6)
    np.testing.assert_allclose(box[6], 0.0, atol=1e-6)
    assert s["labels"][0] == 0  # bed

    sunrgbd_prep.write_infos([("000001", s)], tmp_path / "out", "train")
    import pickle

    infos = pickle.load(open(tmp_path / "out" / "sunrgbd_infos_train.pkl", "rb"))
    assert infos[0]["annos"]["gt_num"] == 1


def test_depth_decode_roundtrip():
    from nesie_tpu.data.sunrgbd_prep import decode_sunrgbd_depth, depth_to_points

    raw = (np.array([[8000, 16000]], np.uint16))  # packed depths
    d = decode_sunrgbd_depth(raw)
    assert d.shape == (1, 2)
    assert (d >= 0).all() and (d <= 8.0).all()
    K = np.array([[100.0, 0, 1], [0, 100, 0], [0, 0, 1]])
    pts = depth_to_points(np.array([[1.0, 2.0]], np.float32), K, np.eye(3))
    assert pts.shape == (2, 3)
    # depth goes to the second (forward) axis in the upright frame
    np.testing.assert_allclose(pts[:, 1], [1.0, 2.0], atol=1e-6)


def test_sunrgbd_yaw_pipeline_end_to_end(tmp_path):
    """Full SUN RGB-D regime smoke: yawed synthetic boxes written in
    sunrgbd infos format, loaded through the dataset, trained with the
    SAQE pretrain config (AngleIntegral heading path) via the production
    runner, then decoded + evaluated (reference simi_sunrgbd_dataset.py:46
    + saqe_head.py:206-207 capability)."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "helpers"))
    from make_tiny_dataset import make_tiny_sunrgbd

    import jax
    from nesie_tpu.config import apply_overrides, get_config
    from nesie_tpu.data.dataset import SubScanNetScenes
    from nesie_tpu.eval.indoor_eval import indoor_eval
    from nesie_tpu.eval.postprocess import decode_and_nms, expand_per_class
    from nesie_tpu.train import runner
    from nesie_tpu.train.step import make_eval_forward

    root = make_tiny_sunrgbd(tmp_path / "data", n_train=4, n_val=2)
    cfg = get_config("saqe-votenet-sunrgbd-pretrain-010")
    cfg = apply_overrides(cfg, [
        "optim.max_epochs=1", "data.repeat=1", "data.num_points=512",
        "data.samples_per_step=2", "model.num_proposal=16",
        "model.reg_max=8", "model.num_points=(64,32,16,16)",
        "model.num_samples=(8,8,4,4)",
        "model.sa_channels=((16,16,32),(32,32,32),(32,32,32),(32,32,32))",
        "model.fp_channels=((32,32),(32,32))",
        "checkpoint_interval_epochs=10", "log_interval=1",
    ])
    cfg = dataclasses.replace(cfg, work_dir=str(tmp_path / "work"),
                              num_devices=1)
    ds = SubScanNetScenes(root, root / cfg.data.train_ann_file,
                          root / cfg.data.label_list_file)
    assert len(ds) >= 2
    # GT must actually carry yaw (the with_yaw=True regime)
    assert any(np.abs(s.boxes[:, 6]).max() > 0.1 for s in ds.scenes)

    state = runner.train_supervised(cfg, ds)
    assert int(state.step) >= 1

    # decode + eval on the held-out val infos
    model = runner.build_model(cfg)
    val = SubScanNetScenes(
        root, root / cfg.data.val_ann_file,
        labeled_ids=[f"synthval{i:04d}" for i in range(2)],
    )
    fwd = make_eval_forward(model, cfg.test.sample_mod)
    batch = val.eval_batch(range(len(val)), np.random.default_rng(0),
                           num_points=512)
    out = fwd(state, jnp.asarray(batch["points"]), jax.random.PRNGKey(0))
    decoded = decode_and_nms(
        out, jnp.asarray(batch["points"]),
        nms_thr=cfg.test.nms_thr, score_thr=cfg.test.score_thr,
        use_iou_for_nms=cfg.test.use_iou_for_nms,
    )
    decoded = jax.tree.map(np.asarray, decoded)
    assert np.isfinite(decoded["bbox"]).all()

    gt, dt = [], []
    for b in range(len(val)):
        boxes, scores, labels = expand_per_class(
            {k: v[b] for k, v in decoded.items()}
        )
        dt.append(dict(boxes=boxes, scores=scores, labels=labels))
        gb = batch["gt_boxes"][b][batch["gt_valid"][b]].copy()
        gb[:, 2] += gb[:, 5] / 2
        gt.append(dict(boxes=gb,
                       labels=batch["gt_labels"][b][batch["gt_valid"][b]]))
    res = indoor_eval(gt, dt, class_names=[str(c) for c in range(10)])
    assert "mAP_0.25" in res
