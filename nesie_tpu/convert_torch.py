"""Torch (.pth) -> nesie_tpu checkpoint converter.

Maps the reference VoteNetNesie/VoteNetSAQE state_dict (mmcv ConvModule
naming: ``<mod>.conv.weight`` / ``<mod>.bn.{weight,bias,running_mean,
running_var}``) onto this framework's flax param/batch_stats pytrees so the
released reference checkpoints can be evaluated directly for mAP parity.

Weight layout translation:
  * Conv1d/Conv2d 1x1 kernels  (out, in, 1[, 1]) -> Dense kernels (in, out)
  * BN weight/bias -> BatchNorm scale/bias; running_mean/var -> batch_stats
  * ``ema_<name-with-underscores>`` buffers -> the teacher (ema_params);
    underscore-mangled names are resolved against the student key set.

Usage:
    python -m nesie_tpu.convert_torch ckpt.pth out_dir --head nesie
"""
from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _dense(w, b=None):
    w = np.asarray(w)
    w = w.reshape(w.shape[0], w.shape[1]).T  # (in, out)
    out = {"kernel": w.astype(np.float32)}
    if b is not None:
        out["bias"] = np.asarray(b, np.float32)
    return out


def _bn(sd, prefix):
    params = {
        "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
        "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
    }
    stats = {
        "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
        "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
    }
    return params, stats


def _convmodule_chain(sd, torch_prefix, n_layers, flax_params, flax_stats,
                      dense_name="dense{}", norm_name="norm{}"):
    """mmcv ConvModule stack 'layer{j}.conv/{bn,gn}' -> PointMLP
    dense{j}/norm{j} (GroupNorm has no running stats)."""
    for j in range(n_layers):
        t = f"{torch_prefix}.layer{j}"
        w = sd[f"{t}.conv.weight"]
        b = sd.get(f"{t}.conv.bias")
        flax_params[dense_name.format(j)] = _dense(w, b)
        if f"{t}.bn.weight" in sd:
            p, s = _bn(sd, f"{t}.bn")
            flax_params[norm_name.format(j)] = p
            flax_stats[norm_name.format(j)] = s
        elif f"{t}.gn.weight" in sd:
            flax_params[norm_name.format(j)] = {
                "scale": np.asarray(sd[f"{t}.gn.weight"], np.float32),
                "bias": np.asarray(sd[f"{t}.gn.bias"], np.float32),
            }


def convert_state_dict(sd, num_sa: int = 4, num_fp: int = 2,
                       head: str = "nesie"):
    """Reference state_dict (name -> np.ndarray) -> (params, batch_stats).

    Covers backbone + vote module + aggregation + conv_pred + quality
    module of the Nesie head (the shipped architecture). Returns flax-style
    nested dicts matching nn.detector.VoteNetNesie.
    """
    params: dict = {"backbone": {}, "bbox_head": {}}
    stats: dict = {"backbone": {}, "bbox_head": {}}

    # ---- backbone SA modules ----
    for i in range(num_sa):
        p, s = {}, {}
        n_layers = len(
            {k.split(".layer")[1].split(".")[0]
             for k in sd if k.startswith(f"backbone.SA_modules.{i}.mlps.0.layer")}
        )
        inner_p, inner_s = {}, {}
        _convmodule_chain(sd, f"backbone.SA_modules.{i}.mlps.0", n_layers,
                          inner_p, inner_s)
        params["backbone"][f"sa{i}"] = {"mlp": inner_p}
        stats["backbone"][f"sa{i}"] = {"mlp": inner_s}

    # ---- backbone FP modules ----
    for i in range(num_fp):
        n_layers = len(
            {k.split(".layer")[1].split(".")[0]
             for k in sd if k.startswith(f"backbone.FP_modules.{i}.mlps.layer")}
        )
        inner_p, inner_s = {}, {}
        _convmodule_chain(sd, f"backbone.FP_modules.{i}.mlps", n_layers,
                          inner_p, inner_s)
        params["backbone"][f"fp{i}"] = {"mlp": inner_p}
        stats["backbone"][f"fp{i}"] = {"mlp": inner_s}

    bh_p, bh_s = {}, {}

    # ---- vote module ----
    vp, vs = {}, {}
    n_layers = len(
        {k.split("vote_conv.")[1].split(".")[0]
         for k in sd if "vote_module.vote_conv." in k and ".conv.weight" in k}
    )
    trunk_p, trunk_s = {}, {}
    for j in range(n_layers):
        t = f"bbox_head.vote_module.vote_conv.{j}"
        trunk_p[f"dense{j}"] = _dense(sd[f"{t}.conv.weight"],
                                      sd.get(f"{t}.conv.bias"))
        p, s = _bn(sd, f"{t}.bn")
        trunk_p[f"norm{j}"] = p
        trunk_s[f"norm{j}"] = s
    vp["trunk"] = trunk_p
    vs["trunk"] = trunk_s
    vp["out"] = _dense(sd["bbox_head.vote_module.conv_out.weight"],
                       sd["bbox_head.vote_module.conv_out.bias"])
    bh_p["vote_module"] = vp
    bh_s["vote_module"] = vs

    # ---- vote aggregation SA ----
    n_layers = len(
        {k.split(".layer")[1].split(".")[0]
         for k in sd if k.startswith("bbox_head.vote_aggregation.mlps.0.layer")}
    )
    agg_p, agg_s = {}, {}
    _convmodule_chain(sd, "bbox_head.vote_aggregation.mlps.0", n_layers,
                      agg_p, agg_s)
    bh_p["vote_aggregation"] = {"mlp": agg_p}
    bh_s["vote_aggregation"] = {"mlp": agg_s}

    # ---- conv_pred ----
    cp_p, cp_s = {}, {}
    n_layers = len(
        {k.split(".layer")[1].split(".")[0]
         for k in sd if k.startswith("bbox_head.conv_pred.shared_convs.layer")}
    )
    sh_p, sh_s = {}, {}
    _convmodule_chain(sd, "bbox_head.conv_pred.shared_convs", n_layers, sh_p, sh_s)
    cp_p["shared"] = sh_p
    cp_s["shared"] = sh_s
    # optional branch conv stacks (cls/bbox: BN; heading: GN(reg_max) —
    # reliable_conv_bbox_module.py:124-142); empty with the shipped configs
    for branch in ("cls_convs", "bbox_convs", "heading_convs"):
        n_layers = len(
            {k.split(".layer")[1].split(".")[0]
             for k in sd
             if k.startswith(f"bbox_head.conv_pred.{branch}.layer")}
        )
        if n_layers:
            br_p, br_s = {}, {}
            _convmodule_chain(sd, f"bbox_head.conv_pred.{branch}", n_layers,
                              br_p, br_s)
            cp_p[branch] = br_p
            if br_s:
                cp_s[branch] = br_s
    for name in ("conv_cls", "conv_bbox", "conv_heading"):
        cp_p[name] = _dense(sd[f"bbox_head.conv_pred.{name}.weight"],
                            sd[f"bbox_head.conv_pred.{name}.bias"])
    bh_p["conv_pred"] = cp_p
    bh_s["conv_pred"] = cp_s

    if head == "saqe":
        # ---- quality module (QualityEstimation, SAQE) ----
        # mlps_before: 6 MiniPointNets (hide 128); mlps_head.{0-5}: 2-conv
        # side heads; mlps_head.6: 3-conv fused global head emitting
        # iou+rotate+R_obj (quelity_estimation_module.py:50-76)
        gq_p, gq_s = {}, {}
        for i in range(6):
            t = f"bbox_head.grid_conv.mlps_before.{i}"
            mp = {
                "first0": _dense(sd[f"{t}.first_conv.0.weight"]),
                "first1": _dense(sd[f"{t}.first_conv.3.weight"],
                                 sd[f"{t}.first_conv.3.bias"]),
                "second0": _dense(sd[f"{t}.second_conv.0.weight"]),
                "second1": _dense(sd[f"{t}.second_conv.3.weight"],
                                  sd[f"{t}.second_conv.3.bias"]),
            }
            p0, s0 = _bn(sd, f"{t}.first_conv.1")
            p1, s1 = _bn(sd, f"{t}.second_conv.1")
            mp["bn0"], mp["bn1"] = p0, p1
            gq_p[f"side_mini{i}"] = mp
            gq_s[f"side_mini{i}"] = {"bn0": s0, "bn1": s1}
            t = f"bbox_head.grid_conv.mlps_head.{i}"
            trunk_p, trunk_s = {}, {}
            trunk_p["dense0"] = _dense(sd[f"{t}.0.weight"], sd[f"{t}.0.bias"])
            p, s = _bn(sd, f"{t}.1")
            trunk_p["norm0"], trunk_s["norm0"] = p, s
            gq_p[f"side_head{i}_trunk"] = trunk_p
            gq_s[f"side_head{i}_trunk"] = trunk_s
            gq_p[f"side_head{i}_out"] = _dense(sd[f"{t}.3.weight"],
                                               sd[f"{t}.3.bias"])
        t = "bbox_head.grid_conv.mlps_head.6"
        trunk_p, trunk_s = {}, {}
        trunk_p["dense0"] = _dense(sd[f"{t}.0.weight"], sd[f"{t}.0.bias"])
        p, s = _bn(sd, f"{t}.1")
        trunk_p["norm0"], trunk_s["norm0"] = p, s
        trunk_p["dense1"] = _dense(sd[f"{t}.3.weight"], sd[f"{t}.3.bias"])
        p, s = _bn(sd, f"{t}.4")
        trunk_p["norm1"], trunk_s["norm1"] = p, s
        gq_p["global_trunk"] = trunk_p
        gq_s["global_trunk"] = trunk_s
        gq_p["global_out"] = _dense(sd[f"{t}.6.weight"], sd[f"{t}.6.bias"])
        bh_p["grid_conv"] = gq_p
        bh_s["grid_conv"] = gq_s
        params["bbox_head"] = bh_p
        stats["bbox_head"] = bh_s
        return params, stats

    # ---- quality module (SidePooling) ----
    gq_p, gq_s = {}, {}
    mini_names = [f"side_mini{i}" for i in range(6)] + ["box_mini"]
    for i, name in enumerate(mini_names):
        t = f"bbox_head.grid_conv.mlps_before.{i}"
        mp = {
            "first0": _dense(sd[f"{t}.first_conv.0.weight"]),
            "first1": _dense(sd[f"{t}.first_conv.3.weight"],
                             sd[f"{t}.first_conv.3.bias"]),
            "second0": _dense(sd[f"{t}.second_conv.0.weight"]),
            "second1": _dense(sd[f"{t}.second_conv.3.weight"],
                              sd[f"{t}.second_conv.3.bias"]),
        }
        p0, s0 = _bn(sd, f"{t}.first_conv.1")
        p1, s1 = _bn(sd, f"{t}.second_conv.1")
        mp["bn0"], mp["bn1"] = p0, p1
        gq_p[name] = mp
        gq_s[name] = {"bn0": s0, "bn1": s1}
    for i in range(6):
        t = f"bbox_head.grid_conv.mlps_head.{i}"
        trunk_p, trunk_s = {}, {}
        trunk_p["dense0"] = _dense(sd[f"{t}.0.weight"], sd[f"{t}.0.bias"])
        p, s = _bn(sd, f"{t}.1")
        trunk_p["norm0"], trunk_s["norm0"] = p, s
        trunk_p["dense1"] = _dense(sd[f"{t}.3.weight"], sd[f"{t}.3.bias"])
        p, s = _bn(sd, f"{t}.4")
        trunk_p["norm1"], trunk_s["norm1"] = p, s
        gq_p[f"side_head{i}_trunk"] = trunk_p
        gq_s[f"side_head{i}_trunk"] = trunk_s
        gq_p[f"side_head{i}_out"] = _dense(sd[f"{t}.6.weight"], sd[f"{t}.6.bias"])
    t = "bbox_head.grid_conv.mlps_head.6"
    trunk_p, trunk_s = {}, {}
    trunk_p["dense0"] = _dense(sd[f"{t}.0.weight"], sd[f"{t}.0.bias"])
    p, s = _bn(sd, f"{t}.1")
    trunk_p["norm0"], trunk_s["norm0"] = p, s
    trunk_p["dense1"] = _dense(sd[f"{t}.3.weight"], sd[f"{t}.3.bias"])
    p, s = _bn(sd, f"{t}.4")
    trunk_p["norm1"], trunk_s["norm1"] = p, s
    gq_p["iou_head_trunk"] = trunk_p
    gq_s["iou_head_trunk"] = trunk_s
    gq_p["iou_head_out"] = _dense(sd[f"{t}.6.weight"], sd[f"{t}.6.bias"])
    bh_p["grid_conv"] = gq_p
    bh_s["grid_conv"] = gq_s

    params["bbox_head"] = bh_p
    stats["bbox_head"] = bh_s
    return params, stats


def extract_ema(sd):
    """Materialize the teacher from ``ema_<mangled>`` buffers: returns a
    FULL state_dict where every parameter that has an EMA buffer is
    replaced by it and everything else (BN running stats — never EMA'd,
    the hook swaps parameters only, simi_teacher_hook.py:46-52/86-92) is
    shared with the student. Returns None when the checkpoint carries no
    EMA buffers (pretrain .pth)."""
    student_keys = [k for k in sd if not k.startswith("ema_")]
    mangled = {k.replace(".", "_"): k for k in student_keys}
    overlay = {}
    for k, v in sd.items():
        if not k.startswith("ema_"):
            continue
        orig = mangled.get(k[4:])
        if orig is not None:
            overlay[orig] = v
    if not overlay:
        return None
    return {k: overlay.get(k, v) for k, v in sd.items()
            if not k.startswith("ema_")}


def load_torch_checkpoint(path):
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.numpy() for k, v in sd.items()}


def main():
    import argparse
    import pickle

    p = argparse.ArgumentParser()
    p.add_argument("pth")
    p.add_argument("out")
    p.add_argument("--head", default="nesie")
    args = p.parse_args()
    sd = load_torch_checkpoint(args.pth)
    params, stats = convert_state_dict(sd, head=args.head)
    payload = {"params": params, "batch_stats": stats}
    ema_sd = extract_ema(sd)
    if ema_sd:
        ep, es = convert_state_dict(ema_sd, head=args.head)
        payload["ema_params"] = ep
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(payload, f)
    print(f"wrote {args.out} ({len(sd)} torch tensors)")


if __name__ == "__main__":
    main()
