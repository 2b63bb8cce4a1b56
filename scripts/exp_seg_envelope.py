#!/usr/bin/env python
"""Reference-envelope 3D-segmentation experiment (VERDICT r2 item 3).

Reference operating point (/root/reference/run_wheat_3dgs.sh:53 +
run_3d_seg.py:243-389): 36 views at 1600x1200, dozens of heads, seg-IoU
threshold 0.6, with `reset_label` merges when adjacent heads overlap.

This script: synthesizes a 36-cam 1600x1200 plot with >=32 heads (random
placement makes several adjacent pairs), trains the reference 7k schedule,
runs the real run_3d_seg pipeline at IoU 0.6, then scores the discovered
3D heads against the generator's ground-truth instance ids by **label
transfer**: every GT point takes the `which_object` label of its nearest
trained splat (gaussians.ply), and per-head IoU/precision/recall are
computed over GT-point sets. This is count-insensitive — the trained
model legitimately uses fewer/more splats than the generator emitted GT
points, so a splat-count-based IoU saturates at the count ratio (~0.5)
even for a perfect labeling. Splat purity (fraction of a discovered
head's splats whose nearest GT point belongs to the matched head) is
kept as a secondary column. Also reports duplicate-id count and
find-&-match wall time.

Usage: python scripts/exp_seg_envelope.py [--skip_train] [--max_masks N]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = os.environ.get("SEG_SCENE", "/tmp/wheat3dgs_segenv_scene")
MODEL = os.environ.get("SEG_MODEL", "/tmp/wheat3dgs_segenv_model")
EXP = "envelope"
# Reference envelope by default; dwarf everything via env for dry runs.
N_HEADS = int(os.environ.get("SEG_HEADS", "36"))
N_CAMS = int(os.environ.get("SEG_CAMS", "36"))
W = int(os.environ.get("SEG_W", "1600"))
H = int(os.environ.get("SEG_H", "1200"))
PTS = int(os.environ.get("SEG_PTS", "2500"))
GROUND = int(os.environ.get("SEG_GROUND", "90000"))
# Per-row camera elevations (row = ring index // 12). The FIP gantry shoots
# near-nadir rows (reference README.md:29-35); a single 40-degree oblique
# ring produced heavy head-on-head occlusion that no SAM-style mask set can
# disambiguate (bootstrap cross-view IoU ~0.67 vs ~0.93 converged).
ELEV = tuple(float(x) for x in
             os.environ.get("SEG_ELEV", "55,65,75").split(","))

ap = argparse.ArgumentParser()
ap.add_argument("--skip_train", action="store_true")
ap.add_argument("--skip_seg", action="store_true")
# 15000, NOT 7000: the reference trains its default 15k schedule and
# run_3d_seg loads the LATEST checkpoint (run_wheat_3dgs.sh:4-53,
# arguments/__init__.py:73). Segging the 7k checkpoint is broken by
# construction — it sits 1000 iters after the 6000 opacity reset, so
# median head-splat opacity is ~0.18 and any lifted subset renders as a
# bloated transparent blob (measured self-view IoU 0.56, round-5 probe);
# by 15k the last reset (9000, densify_until=11000 gates later ones) is
# 6000 iters back and opacities have re-hardened.
ap.add_argument("--iters", type=int, default=15000)
ap.add_argument("--seg_wall", type=float, default=None,
                help="with --skip_seg: record this find-&-match wall time "
                     "(s) for a run scored from existing artifacts")
ap.add_argument("--note", default=None,
                help="free-text provenance note stored in the report "
                     "(e.g. partial-run coverage)")
args = ap.parse_args()


def sh(cmd):
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


if not os.path.exists(os.path.join(SCENE, "sparse", "0", "points3D.bin")):
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    t0 = time.time()
    make_synthetic_colmap_scene(
        SCENE, width=W, height=H, n_cams=N_CAMS, n_heads=N_HEADS,
        pts_per_head=PTS, ground_pts=GROUND, seed=3, with_masks=True,
        cam_elev_deg=ELEV)
    print(f"scene synthesized in {time.time() - t0:.0f}s", file=sys.stderr)

if not args.skip_train:
    t0 = time.time()
    # Via the stall watchdog (scripts/train_watchdog.py): the remote-TPU
    # tunnel can wedge mid-run; checkpoint cadence + auto-resume.
    sh([sys.executable, "scripts/train_watchdog.py", "-s", SCENE,
        "-m", MODEL,
        "--stall_s", os.environ.get("SEG_STALL_S", "900"),
        "--eval", "--resolution", "1", "--iterations", str(args.iters),
        "--test_iterations", str(args.iters),
        "--save_iterations", str(args.iters)])
    print(f"train wall: {time.time() - t0:.0f}s", file=sys.stderr)

if not args.skip_seg:
    t0 = time.time()
    sh([sys.executable, "run_3d_seg.py", "-s", SCENE, "-m", MODEL,
        "--exp_name", EXP, "--iou_threshold", "0.6"])
    seg_wall = time.time() - t0
    print(f"seg wall: {seg_wall:.0f}s", file=sys.stderr)
else:
    seg_wall = args.seg_wall if args.seg_wall is not None else float("nan")

# ---- Score discovered heads against generator ground truth --------------
# Label transfer: every GT point takes the `which_object` label of its
# nearest trained splat; metrics are set overlaps over GT points (count-
# insensitive). Reference artifact: run_3d_seg.py writes the same
# which_object-labeled gaussians.ply (/root/reference/run_3d_seg.py:385,391).
from wheat3dgs_tpu.io.ply import read_ply  # noqa: E402

gt_npz = np.load(os.path.join(SCENE, "gt_points.npz"))
gt_xyz = gt_npz["points"].astype(np.float32)
gt_id = gt_npz["head_id"].astype(np.int32)

head_dir = os.path.join(MODEL, "wheat-head", EXP, "ply")
plys = sorted(f for f in os.listdir(head_dir) if f.startswith("wh_"))
print(f"{len(plys)} heads discovered (gt {N_HEADS})")

lab_ply = read_ply(os.path.join(MODEL, "wheat-head", EXP, "gaussians.ply"))
pred_xyz = np.stack([lab_ply[c] for c in "xyz"], axis=1).astype(np.float32)
pred_lab = lab_ply["which_object"].astype(np.int32)


def nearest_idx(query: np.ndarray, pts: np.ndarray,
                chunk: int = 1024) -> np.ndarray:
    """Index of the nearest point in `pts` for each query row (cKDTree,
    with a chunked brute-force fallback if scipy is ever absent)."""
    try:
        from scipy.spatial import cKDTree
        return cKDTree(pts).query(query, k=1)[1].astype(np.int64)
    except ImportError:
        out = np.empty(len(query), np.int64)
        for i in range(0, len(query), chunk):
            q = query[i:i + chunk]
            d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
            out[i:i + chunk] = np.argmin(d, axis=1)
        return out


gt_translab = pred_lab[nearest_idx(gt_xyz, pred_xyz)]   # pred label per GT pt
splat_gtlab = gt_id[nearest_idx(pred_xyz, gt_xyz)]      # gt label per splat

rows, claimed, duplicates = [], {}, 0
seen_ids = set()
for f in plys:
    # `wh_<id>.ply` or `wh_<id>_<letter>.ply` (a reset_label merge re-save
    # of the same head id, reference find_new_mask_dir run_3d_seg.py:33-46)
    hid = int(f[3:-4].split("_")[0])
    if hid in seen_ids:
        continue
    seen_ids.add(hid)
    pred_set = gt_translab == hid                        # GT points claimed
    n_splats = int((pred_lab == hid).sum())
    vals, cnts = np.unique(gt_id[pred_set][gt_id[pred_set] > 0],
                           return_counts=True)
    if len(vals) == 0:
        rows.append((hid, -1, 0.0, 0.0, 0.0, 0.0, n_splats))
        continue
    match = int(vals[np.argmax(cnts)])
    inter = int(cnts.max())
    gt_set = gt_id == match
    precision = inter / int(pred_set.sum())
    recall = inter / int(gt_set.sum())
    iou = inter / int((pred_set | gt_set).sum())
    own = splat_gtlab[pred_lab == hid]
    purity = float((own == match).mean()) if len(own) else 0.0
    if match in claimed:
        duplicates += 1
    claimed[match] = claimed.get(match, 0) + 1
    rows.append((hid, match, iou, precision, recall, purity, n_splats))

report = {
    "n_gt_heads": N_HEADS,
    # Distinct final head ids: `wh_<id>_<letter>.ply` files are the
    # reference's re-identification re-saves of an EXISTING id (reset_label
    # merge, run_3d_seg.py:336), not separate discovered heads.
    "n_discovered": len(seen_ids),
    "n_ply_files": len(plys),
    # Counting accuracy — the paper's headline application metric
    # (README.md:9-14: counting via instance extraction): relative error of
    # the discovered-head count against the known ground truth.
    "counting_accuracy": round(
        1.0 - abs(len(seen_ids) - N_HEADS) / N_HEADS, 4),
    "n_matched_gt": len(claimed),
    "duplicate_id_count": duplicates,
    "metric": "label-transfer over GT points (nearest trained splat)",
    "mean_iou": float(np.mean([r[2] for r in rows])) if rows else 0.0,
    "mean_precision": float(np.mean([r[3] for r in rows])) if rows else 0.0,
    "mean_recall": float(np.mean([r[4] for r in rows])) if rows else 0.0,
    "mean_splat_purity": float(np.mean([r[5] for r in rows])) if rows
    else 0.0,
    "seg_wall_s": seg_wall,
    "note": args.note,
    "per_head": [
        {"pred_id": r[0], "gt_id": r[1], "iou": round(r[2], 4),
         "precision": round(r[3], 4), "recall": round(r[4], 4),
         "splat_purity": round(r[5], 4), "n_gaussians": r[6]}
        for r in rows],
}
out_path = os.path.join(MODEL, "wheat-head", EXP, "envelope_report.json")
with open(out_path, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps({k: v for k, v in report.items() if k != "per_head"},
                 indent=1))
print("report:", out_path)
