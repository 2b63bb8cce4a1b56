#!/usr/bin/env python
"""IoU-threshold sweep of the seg pipeline on the envelope scene, reusing
one SegContext (mask bits + per-camera FlashSplat counts caches are
threshold-independent, so each extra threshold costs only the matching
renders). Scores every run by GT label transfer like exp_seg_envelope.py.

Usage: python scripts/exp_seg_sweep.py [--thresholds 0.5,0.6]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENE = os.environ.get("SEG_SCENE", "/tmp/wheat3dgs_segenv_scene")
MODEL = os.environ.get("SEG_MODEL", "/tmp/wheat3dgs_segenv_model")

ap = argparse.ArgumentParser()
ap.add_argument("--thresholds", default="0.5")
args = ap.parse_args()


def score(exp_name: str, seg_wall: float, n_gt: int) -> dict:
    """Label-transfer scoring (same metric as exp_seg_envelope.py)."""
    from scipy.spatial import cKDTree

    from wheat3dgs_tpu.io.ply import read_ply

    gt_npz = np.load(os.path.join(SCENE, "gt_points.npz"))
    gt_xyz = gt_npz["points"].astype(np.float32)
    gt_id = gt_npz["head_id"].astype(np.int32)
    base = os.path.join(MODEL, "wheat-head", exp_name)
    plys = sorted(f for f in os.listdir(os.path.join(base, "ply"))
                  if f.startswith("wh_"))
    lab = read_ply(os.path.join(base, "gaussians.ply"))
    pred_xyz = np.stack([lab[c] for c in "xyz"], 1).astype(np.float32)
    pred_lab = lab["which_object"].astype(np.int32)
    gt_translab = pred_lab[cKDTree(pred_xyz).query(gt_xyz, k=1)[1]]
    splat_gtlab = gt_id[cKDTree(gt_xyz).query(pred_xyz, k=1)[1]]

    rows, claimed, duplicates, seen = [], {}, 0, set()
    for f in plys:
        hid = int(f[3:-4].split("_")[0])
        if hid in seen:
            continue
        seen.add(hid)
        pred_set = gt_translab == hid
        vals, cnts = np.unique(gt_id[pred_set][gt_id[pred_set] > 0],
                               return_counts=True)
        if len(vals) == 0:
            rows.append((hid, -1, 0.0, 0.0, 0.0, 0.0))
            continue
        match = int(vals[np.argmax(cnts)])
        inter = int(cnts.max())
        gt_set = gt_id == match
        own = splat_gtlab[pred_lab == hid]
        if match in claimed:
            duplicates += 1
        claimed[match] = claimed.get(match, 0) + 1
        rows.append((hid, match, inter / int((pred_set | gt_set).sum()),
                     inter / int(pred_set.sum()), inter / int(gt_set.sum()),
                     float((own == match).mean()) if len(own) else 0.0))
    rep = {
        "n_gt_heads": n_gt, "n_discovered": len(seen),
        "n_matched_gt": len(claimed), "duplicate_id_count": duplicates,
        "mean_iou": float(np.mean([r[2] for r in rows])) if rows else 0.0,
        "mean_precision": float(np.mean([r[3] for r in rows])) if rows
        else 0.0,
        "mean_recall": float(np.mean([r[4] for r in rows])) if rows else 0.0,
        "mean_splat_purity": float(np.mean([r[5] for r in rows])) if rows
        else 0.0,
        "seg_wall_s": seg_wall,
        "per_head": [
            {"pred_id": r[0], "gt_id": r[1], "iou": round(r[2], 4),
             "precision": round(r[3], 4), "recall": round(r[4], 4),
             "splat_purity": round(r[5], 4)} for r in rows],
    }
    with open(os.path.join(base, "envelope_report.json"), "w") as f:
        json.dump(rep, f, indent=1)
    return rep


def main():
    import time

    from wheat3dgs_tpu import config as cfg
    from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                               inference_config)
    from wheat3dgs_tpu.scene import Scene
    from wheat3dgs_tpu.apps.run_3d_seg_app import build_context
    from wheat3dgs_tpu.seg.pipeline import run_segmentation
    from wheat3dgs_tpu.utils.general import seed_everything

    model = cfg.ModelParams(source_path=SCENE, model_path=MODEL, eval=True,
                            resolution=1)
    scene = Scene(model, load_iteration=-1, shuffle=False)
    n_gt = json.load(open(os.path.join(SCENE, "manifest.json")))["n_heads"]
    w0, h0 = scene.image_size
    n_train = len(scene.data.train.metas)
    config = adapt_config(
        scene.gaussians, scene.cam_arrays("train", 0), w0, h0,
        inference_config(RasterConfig()),
        cams=[scene.cam_arrays("train", i) for i in range(n_train)])
    ctx = build_context(scene, config)
    test_group = scene.data.test
    eval_names = [m.image_name for m in test_group.metas]
    c = test_group.cameras
    eval_cams = (c.w2c, c.full_proj, c.cam_center, c.tanfovx, c.tanfovy) \
        if eval_names else None

    for thr in (float(t) for t in args.thresholds.split(",")):
        exp = f"env_iou{int(round(thr * 100)):02d}"
        seed_everything(0)
        t0 = time.time()
        run_segmentation(ctx, MODEL, exp, iou_threshold=thr,
                         eval_names=eval_names, eval_cams=eval_cams,
                         verbose=False)
        wall = time.time() - t0
        rep = score(exp, wall, n_gt)
        print(json.dumps({"iou_threshold": thr, **{
            k: v for k, v in rep.items() if k != "per_head"}}))


if __name__ == "__main__":
    main()
