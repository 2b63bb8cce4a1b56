#!/usr/bin/env python
"""Benchmark config #4 closer: morphology traits of DISCOVERED heads vs the
generator's GROUND-TRUTH per-head point clouds.

The synthetic generator records every emitted point with its head id
(gt_points.npz), so the same trait extractor
(wheat3dgs_tpu.morphology.traits.compute_traits — length, 99th-pct width,
Qhull volume, inclination, curvature; reference
traits_extraction_functions.py:119-146) can score both sides of each
(pred head -> matched GT head) pair from the envelope report. Relative
errors per trait quantify how faithful splat-based morphology is to the
underlying geometry.

Usage: python scripts/exp_morph_compare.py
Writes /tmp/morph_compare.json and prints a markdown table for REPORT.md.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from wheat3dgs_tpu.io.ply import read_ply
from wheat3dgs_tpu.morphology.pcp_utils import (main_cluster_extraction,
                                                statistical_outlier_removal,
                                                subsample_pcd)
from wheat3dgs_tpu.morphology.traits import compute_traits

# The reference NEVER runs traits on a raw head cloud: the morphology
# pipeline subsamples, keeps the largest HDBSCAN cluster, and SOR-filters
# first (wheatheadsmorphology pipeline; reference main.py flow). Splat
# impurity makes this mandatory here — ~43% of a discovered head's splats
# sit on other heads/ground (mean purity 0.57, envelope_report), and
# extent-based traits (length, volume) are unbounded in those outliers.
# Same parameters as the envelope morphology config
# (scripts/exp_seg360_morph.sh).
CLUSTERER = {"type": "hdbscan", "min_samples": 15, "min_cluster_size": 250,
             "epsilon_hdbscan": 0.015}


def _s_val(pts: np.ndarray) -> float:
    from wheat3dgs_tpu.morphology.traits import run_pca

    proj, _ = run_pca(pts)
    return float(len(pts) * np.var(proj[:, 1]))


def preprocess(pts: np.ndarray) -> np.ndarray:
    pts = subsample_pcd(pts, 5000, rng=np.random.default_rng(0))
    try:
        pts = main_cluster_extraction(pts, CLUSTERER)
    except Exception:
        pass                     # degenerate cloud: score it raw
    if len(pts) > 20:
        pts, _ = statistical_outlier_removal(pts, k=min(200, len(pts) - 1),
                                             std_ratio=3.0)
    return pts

SCENE = os.environ.get("SEG_SCENE", "/tmp/wheat3dgs_segenv_scene")
MODEL = os.environ.get("SEG_MODEL", "/tmp/wheat3dgs_segenv_model")
EXP = os.environ.get("EXP", "envelope")

TRAITS = ["length", "width", "volume", "inclination", "curvature"]

rep = json.load(open(os.path.join(
    MODEL, "wheat-head", EXP, "envelope_report.json")))
gt = np.load(os.path.join(SCENE, "gt_points.npz"))
gt_xyz, gt_id = gt["points"].astype(np.float64), gt["head_id"]

ply_dir = os.path.join(MODEL, "wheat-head", EXP, "ply")

rows, rels = [], {t: [] for t in TRAITS}
for h in rep["per_head"]:
    if h["gt_id"] <= 0 or h["iou"] < 0.3:
        continue  # unmatched/garbage ids are scored by the seg table already
    pred_path = os.path.join(ply_dir, f"wh_{h['pred_id']:04d}.ply")
    if not os.path.exists(pred_path):
        continue
    d = read_ply(pred_path)
    pred_pts = preprocess(
        np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float64))
    gt_pts = preprocess(gt_xyz[gt_id == h["gt_id"]])
    if len(pred_pts) < 20 or len(gt_pts) < 20:
        continue
    # Scale-aware spline smoothing, same rule both sides: the pipeline's
    # fixed s=1 is a TOTAL squared-residual budget, meaningful only at the
    # reference's physical units — at this synthetic scene's scale (heads
    # ~0.2 units) s=1 lets the spline chase per-splat noise and the arc
    # length explodes (measured 10-80x GT). scipy's recommended regime is
    # s ~ m * sigma^2 of the fitted residuals.
    pt = compute_traits(pred_pts, 99, _s_val(pred_pts))
    gt_t = compute_traits(gt_pts, 99, _s_val(gt_pts))
    row = {"pred_id": h["pred_id"], "gt_id": h["gt_id"], "iou": h["iou"],
           "n_pred": len(pred_pts), "n_gt": len(gt_pts)}
    for t, pv, gv in zip(TRAITS, pt, gt_t):
        row[t] = round(float(pv), 5)
        row[f"gt_{t}"] = round(float(gv), 5)
        if abs(gv) > 1e-9:
            rels[t].append(abs(pv - gv) / abs(gv))
    rows.append(row)

summary = {
    "n_pairs": len(rows),
    "median_rel_err": {t: round(float(np.median(rels[t])), 4)
                       for t in TRAITS if rels[t]},
    "mean_rel_err": {t: round(float(np.mean(rels[t])), 4)
                     for t in TRAITS if rels[t]},
    "rows": rows,
}
out = "/tmp/morph_compare.json"
json.dump(summary, open(out, "w"), indent=1)
print(json.dumps({k: v for k, v in summary.items() if k != "rows"},
                 indent=1))

print("\n| trait | median rel err | mean rel err |")
print("|---|---|---|")
for t in TRAITS:
    if rels[t]:
        print(f"| {t} | {np.median(rels[t]):.1%} | {np.mean(rels[t]):.1%} |")
print(f"\n{len(rows)} matched (pred, GT) head pairs; report: {out}")
