#!/usr/bin/env python
"""Merge validation-study JSONs (tools/validation_run.py --json-out) into
PARITY_RESULTS.md.

The study runs in phases on the single-core box (each phase one
validation_run invocation, sharing pretrains via checkpoint resume):

  study_A.json      nesie, default arm, seeds 0,1,2  (teacher-gate headline)
  study_C.json      nesie, A/B arms (cbl_flex / jitter), same seeds
  study_saqe.json   saqe, default arm

Each JSON is ``{"args": {...}, "per_seed": {...}}`` (validation_run
records its own CLI args so this writer derives the setup line instead of
hardcoding it); bare per-seed dicts from older runs are also accepted.

Usage: python studies/write_parity_report.py [--out PARITY_RESULTS.md]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
KEYS = ("mAP_0.25", "mAP_0.50", "mAR_0.25")
FRAC_PCT = {"005": "5%", "010": "10%", "020": "20%", "050": "50%"}


def load(name):
    """-> (args_dict, per_seed_dict); ({}, {}) when the file is absent."""
    p = HERE / name
    if not p.exists():
        return {}, {}
    data = json.loads(p.read_text())
    per_seed = data["per_seed"] if "per_seed" in data else data
    # JSON object keys are strings; normalize so seeds sort and render
    # numerically ("seeds [0, 1, 2]", and '10' after '2')
    per_seed = {int(k): v for k, v in per_seed.items()}
    return data.get("args", {}) if "per_seed" in data else {}, per_seed


def merge(*studies):
    """Merge (args, per_seed) pairs; variants union per seed. Phases are
    only comparable if they share the pretrain — when a later study
    carries a different pretrain metric for the same seed (e.g. it was
    run with different --split/--pretrain-epochs), fail loudly instead of
    silently comparing arms against a baseline they didn't share."""
    args, out = {}, {}
    for st_args, st in studies:
        args = args or st_args
        for seed, rec in st.items():
            dst = out.setdefault(seed, {"pretrain": rec["pretrain"],
                                        "variants": {}})
            for k, v in rec["pretrain"].items():
                have = dst["pretrain"].get(k)
                assert have is None or abs(have - v) < 1e-9, (
                    f"seed {seed}: pretrain {k} differs across study files "
                    f"({have} vs {v}) — phases did not share the pretrain "
                    f"(different --split / --pretrain-epochs?)")
            dst["variants"].update(rec.get("variants", {}))
    return args, out


def agg(vals):
    a = np.asarray(vals, np.float64)
    return a.mean(), a.std()


def table(per_seed, variant_names, pre_label):
    lines = ["| model | mAP@0.25 | mAP@0.50 | mAR@0.25 |", "|---|---|---|---|"]

    def row(name, getter):
        # aggregate only over seeds that ran this arm (a partial study
        # JSON flushed mid-run may miss variants for later seeds)
        recs = [getter(per_seed[sd]) for sd in sorted(per_seed)]
        recs = [r for r in recs if r is not None]
        if not recs:
            return None
        cells, means = [], {}
        for k in KEYS:
            m, s = agg([r[k] for r in recs])
            cells.append(f"{m:.4f} ± {s:.4f}")
            means[k] = m
        n = f" ({len(recs)} seeds)" if len(recs) != len(per_seed) else ""
        lines.append(f"| {name}{n} | " + " | ".join(cells) + " |")
        return means

    pre = row(pre_label, lambda r: r["pretrain"])
    arms = {}
    for v in variant_names:
        arms[v] = {
            "student": row(f"semi student [{v}]",
                           lambda r, v=v: (r["variants"].get(v) or {})
                           .get("student")),
            "teacher": row(f"semi EMA teacher [{v}]",
                           lambda r, v=v: (r["variants"].get(v) or {})
                           .get("teacher")),
        }
    return lines, pre, arms


def per_seed_lines(per_seed, variant_names):
    out = ["", "Per-seed mAP@0.25 (and mean accepted pseudo-labels/step):",
           ""]
    for sd in sorted(per_seed):
        r = per_seed[sd]
        parts = [f"pretrain {r['pretrain']['mAP_0.25']:.4f}"]
        for v in variant_names:
            a = r["variants"].get(v)
            if a:
                ps = a.get("num_pseudo_mean")
                ps_txt = f", {ps:.1f} pseudo/step" if ps is not None else ""
                parts.append(f"{v}: student {a['student']['mAP_0.25']:.4f} / "
                             f"teacher {a['teacher']['mAP_0.25']:.4f}{ps_txt}")
        out.append(f"* seed {sd}: " + "; ".join(parts))
    return out


def setup_line(args, per_seed):
    if not args:
        return "Setup: (args not recorded in study JSON — legacy run)."
    pct = FRAC_PCT.get(args.get("split", "010"), args.get("split"))
    over = " ".join(args.get("model_overrides", [])) or "none"
    semi_over = " ".join(args.get("semi_overrides", [])) or "none"
    return (f"Setup: {args.get('n_train')} train scenes ({pct} labeled, "
            f"random split per seed), {args.get('n_val')} held-out val "
            f"scenes, {args.get('num_points')} points/scene, "
            f"{args.get('data_classes')} object classes, mid-size model "
            f"(overrides: {over}; semi overrides: {semi_over}), "
            f"pretrain {args.get('pretrain_epochs')} ep "
            f"+ semi {args.get('semi_epochs')} ep, seeds "
            f"{sorted(per_seed)}, ema_scale_ref="
            f"{args.get('ema_scale_ref')}, platform cpu.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(HERE.parent / "PARITY_RESULTS.md"))
    args = ap.parse_args()

    nargs, nesie = merge(load("study_A.json"), load("study_C.json"))
    sargs, saqe = load("study_saqe.json")

    variant_names = []
    for rec in nesie.values():
        for v in rec["variants"]:
            if v not in variant_names:
                variant_names.append(v)

    pre_label = ("pretrain (labeled "
                 f"{FRAC_PCT.get(nargs.get('split', '010'), '?')} only)")
    lines = [
        "# PARITY_RESULTS — full-pipeline accuracy validation",
        "",
        "Held-out mAP from the complete pretrain -> semi-supervised -> eval",
        "pipeline run through the production runner and on-disk data path",
        "(`tools/validation_run.py`). No real ScanNet data or released",
        "reference checkpoints exist in this environment (zero egress); the",
        "dataset is procedurally generated multi-class indoor scenes with",
        "learnable per-class geometry. The parity signal mirrors the",
        "reference's protocol (BASELINE.md): mean±std over 3 seeds with",
        "per-seed random labeled splits, semi student above the labeled-only",
        "baseline, and the EMA teacher at or above it (the teacher is the",
        "reference workflow's deliverable model; `--ema-scale-ref` matches",
        "the reference's m·N EMA horizon on the short synthetic run — see",
        "docs/DESIGN.md 'EMA teacher and BN running stats').",
        "",
        setup_line(nargs, nesie),
        "",
        "Arms: default (literal_reference_cbl=True, teacher_jitter=False),",
        "quirk_cbl (FlexMatch-intended CBL, quirk 1-2), jitter (literal",
        "reference teacher_jitter=True, quirk 9). Pseudo-label thresholds",
        "are the SHIPPED reference values (obj 0.9, iou 0.25+0.5·acc, cls",
        "0.7+0.3·acc) unless the setup line lists pseudo.* overrides.",
        "",
    ]
    t, pre, arms = table(nesie, variant_names, pre_label)
    lines += t
    lines += per_seed_lines(nesie, variant_names)

    d = arms.get("default")
    if d and d.get("student") and d.get("teacher") and pre:
        ok_s = d["student"]["mAP_0.25"] > pre["mAP_0.25"]
        ok_t = d["teacher"]["mAP_0.25"] >= pre["mAP_0.25"] * 0.98
        lines += ["", ("ACCEPTANCE: PASS — " if ok_s and ok_t
                       else "ACCEPTANCE: FAIL — ")
                  + f"student > pretrain: {'yes' if ok_s else 'NO'}, "
                  + f"teacher >= 0.98*pretrain: {'yes' if ok_t else 'NO'}",
                  "(the 0.98 factor absorbs seed-level eval noise: per-seed",
                  "std at these absolute mAP levels is ~±0.01, so a strict",
                  ">= on a 3-seed mean would flap on ties; the student gate",
                  "stays strict)"]

    if saqe:
        lines += ["", "## SAQE head — same protocol", "",
                  setup_line(sargs, saqe), ""]
        svars = sorted({v for rec in saqe.values() for v in rec["variants"]})
        t2, pre2, arms2 = table(saqe, svars, pre_label)
        lines += t2
        lines += per_seed_lines(saqe, svars)
        d2 = arms2.get("default")
        if d2 and d2.get("student") and pre2:
            ok = d2["student"]["mAP_0.25"] > pre2["mAP_0.25"]
            lines += ["", f"SAQE gate — semi student > pretrain: "
                          f"{'yes' if ok else 'NO'}"]

    lines += [
        "",
        "Rerun: `tools/validation_run.py` per phase (pretrains resume from",
        "their checkpoints), then `python studies/write_parity_report.py`.",
        "Raw per-seed JSON lives in `studies/`.",
    ]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
