#!/usr/bin/env python
"""Reference-envelope 3D-segmentation experiment (VERDICT r2 item 3).

Reference operating point (/root/reference/run_wheat_3dgs.sh:53 +
run_3d_seg.py:243-389): 36 views at 1600x1200, dozens of heads, seg-IoU
threshold 0.6, with `reset_label` merges when adjacent heads overlap.

This script: synthesizes a 36-cam 1600x1200 plot with >=32 heads (random
placement makes several adjacent pairs), trains the reference 7k schedule,
runs the real run_3d_seg pipeline at IoU 0.6, then scores the discovered
3D heads against the generator's ground-truth instance ids:
per-head IoU/precision/recall (3D, over Gaussian assignment via nearest
GT point), duplicate-id count, and find-&-match wall time.

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

ap = argparse.ArgumentParser()
ap.add_argument("--skip_train", action="store_true")
ap.add_argument("--skip_seg", action="store_true")
ap.add_argument("--iters", type=int, default=7000)
args = ap.parse_args()


def sh(cmd):
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


if not os.path.exists(os.path.join(SCENE, "sparse", "0", "points3D.bin")):
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    t0 = time.time()
    make_synthetic_colmap_scene(
        SCENE, width=W, height=H, n_cams=N_CAMS, n_heads=N_HEADS,
        pts_per_head=PTS, ground_pts=GROUND, seed=3, with_masks=True)
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
    seg_wall = float("nan")

# ---- Score discovered heads against generator ground truth --------------
from wheat3dgs_tpu.io.ply import read_ply  # noqa: E402

gt_npz = np.load(os.path.join(SCENE, "gt_points.npz"))
gt_xyz = gt_npz["points"].astype(np.float32)
gt_id = gt_npz["head_id"].astype(np.int32)

head_dir = os.path.join(MODEL, "wheat-head", EXP, "ply")
plys = sorted(f for f in os.listdir(head_dir) if f.startswith("wh_"))
print(f"{len(plys)} heads discovered (gt {N_HEADS})")


def nearest_gt_label(xyz: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """Label each query point with the instance id of its nearest GT point
    (brute-force in chunks — tens of millions of pairs, host numpy)."""
    out = np.empty(len(xyz), np.int32)
    for i in range(0, len(xyz), chunk):
        q = xyz[i:i + chunk]
        d = ((q[:, None, :] - gt_xyz[None, :, :]) ** 2).sum(-1)
        out[i:i + chunk] = gt_id[np.argmin(d, axis=1)]
    return out


rows, claimed, duplicates = [], {}, 0
for f in plys:
    hid = int(f[3:-4])
    data = read_ply(os.path.join(head_dir, f))
    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1)
    labels = nearest_gt_label(xyz)
    vals, cnts = np.unique(labels[labels > 0], return_counts=True)
    if len(vals) == 0:
        rows.append((hid, -1, 0.0, 0.0, 0.0, len(xyz)))
        continue
    match = int(vals[np.argmax(cnts)])
    tp = int(cnts.max())
    precision = tp / len(xyz)
    gt_sz = int((gt_id == match).sum())
    # recall proxy: fraction of the GT head's points whose nearest
    # predicted point is from this head — approximated by coverage of the
    # matched points vs GT size (pred splats != gt points 1:1).
    recall = min(1.0, tp / gt_sz) if gt_sz else 0.0
    iou = tp / (len(xyz) + gt_sz - tp)
    if match in claimed:
        duplicates += 1
    claimed[match] = claimed.get(match, 0) + 1
    rows.append((hid, match, iou, precision, recall, len(xyz)))

report = {
    "n_gt_heads": N_HEADS,
    "n_discovered": len(plys),
    "n_matched_gt": len(claimed),
    "duplicate_id_count": duplicates,
    "mean_iou": float(np.mean([r[2] for r in rows])) if rows else 0.0,
    "mean_precision": float(np.mean([r[3] for r in rows])) if rows else 0.0,
    "mean_recall": float(np.mean([r[4] for r in rows])) if rows else 0.0,
    "seg_wall_s": seg_wall,
    "per_head": [
        {"pred_id": r[0], "gt_id": r[1], "iou": round(r[2], 4),
         "precision": round(r[3], 4), "recall": round(r[4], 4),
         "n_gaussians": r[5]} for r in rows],
}
out_path = os.path.join(MODEL, "wheat-head", EXP, "envelope_report.json")
with open(out_path, "w") as f:
    json.dump(report, f, indent=1)
print(json.dumps({k: v for k, v in report.items() if k != "per_head"},
                 indent=1))
print("report:", out_path)
