#!/usr/bin/env python
"""Multi-plot scale-out measurement on the attached chip (VERDICT r3 item 7).

The reference trains plots 461-467 as one SLURM job per plot
(/root/reference/run_wheat_3dgs.sh:7,23-28) — purely sequential per GPU.
Here `apps/train_multi.py` trains P plots inside ONE jit program over a
('plot' x 'view') mesh; on a single chip the plot axis time-multiplexes,
so the interesting numbers are:

  - per-plot it/s at P = 1, 2, 4 (how much each plot slows down), and
  - total plot-iters/s (aggregate work rate vs P sequential single-plot
    runs — the vmapped step amortizes per-step host dispatch and lets XLA
    overlap the small per-plot ops, so aggregate > 1x sequential is the
    win to look for; on a P-device mesh the same program recovers ~P x).

Steady-state rate = iterations (log_at, iters] / elapsed delta, skipping
the compile-heavy first block. Plots are small (800x600, 12 cams) so the
experiment fits a bench-scale TPU slot; the scaling *shape* is what
transfers to the 1600x1200 envelope.

Usage: python scripts/exp_multiplot.py [--iters 600] [--plots 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from wheat3dgs_tpu.apps.train_multi import training
from wheat3dgs_tpu.config import ModelParams, OptimizationParams
from wheat3dgs_tpu.render.pipeline import RasterConfig, inference_config

BASE = os.environ.get(
    "WHEAT3DGS_MULTIPLOT_SCENES",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".bench_cache", "multiplot"))
W, H, N_CAMS, N_HEADS = 800, 600, 12, 8

ap = argparse.ArgumentParser()
ap.add_argument("--iters", type=int, default=600)
ap.add_argument("--log_at", type=int, default=200,
                help="steady-state window start (skips compile block)")
ap.add_argument("--plots", type=int, default=4)
ap.add_argument("--out", default="/tmp/multiplot_report.json")
args = ap.parse_args()


def ensure_plot(idx: int) -> str:
    path = os.path.join(BASE, f"plot_{idx:03d}")
    if not os.path.exists(os.path.join(path, "sparse", "0", "points3D.bin")):
        from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene
        t0 = time.time()
        make_synthetic_colmap_scene(
            path, width=W, height=H, n_cams=N_CAMS, n_heads=N_HEADS,
            pts_per_head=1200, ground_pts=16_000, seed=100 + idx,
            with_masks=False)
        print(f"synthesized {path} in {time.time() - t0:.0f}s",
              file=sys.stderr)
    return path


paths = [ensure_plot(i) for i in range(args.plots)]
config = inference_config(RasterConfig())
rows = []
for p in (1, 2, 4):
    if p > args.plots:
        continue
    model_base = f"/tmp/multiplot_model_p{p}"
    opt = OptimizationParams(
        iterations=args.iters, densify_from_iter=100,
        densify_until_iter=args.iters - 100, densification_interval=100,
        opacity_reset_interval=100_000)
    model_tpl = ModelParams(source_path="", model_path="", eval=True,
                            resolution=1)
    t0 = time.time()
    training(paths[:p], model_base, opt, model_tpl, sh_degree=3,
             views_per_step=1, config=config, log_every=args.log_at,
             quiet=True)
    wall = time.time() - t0
    recs = [json.loads(l) for l in
            open(os.path.join(model_base, "metrics_multi.jsonl"))]
    # metrics_multi.jsonl appends across runs; keep this run's records.
    recs = [r for r in recs if r["elapsed_s"] <= wall + 1.0][-(
        args.iters // args.log_at):]
    t_a = next(r for r in recs if r["iter"] == args.log_at)
    t_b = recs[-1]
    steady = (t_b["iter"] - t_a["iter"]) / (
        t_b["elapsed_s"] - t_a["elapsed_s"])
    rows.append({
        "plots": p,
        "per_plot_it_per_s": round(steady, 2),
        "total_plot_iters_per_s": round(steady * p, 2),
        "wall_s": round(wall, 1),
        "mean_final_psnr": round(
            float(sum(t_b["psnr"]) / len(t_b["psnr"])), 2),
    })
    print(json.dumps(rows[-1]), flush=True)

seq = rows[0]["per_plot_it_per_s"] if rows else float("nan")
for r in rows:
    r["aggregate_vs_sequential"] = round(
        r["total_plot_iters_per_s"] / seq, 2) if seq else None

report = {"width": W, "height": H, "n_cams": N_CAMS,
          "device": str(jax.devices()[0]), "rows": rows}
with open(args.out, "w") as f:
    json.dump(report, f, indent=1)
print("\n| P plots | per-plot it/s | total plot-iters/s | vs P=1 sequential |")
print("|---|---|---|---|")
for r in rows:
    print(f"| {r['plots']} | {r['per_plot_it_per_s']} | "
          f"{r['total_plot_iters_per_s']} | "
          f"{r['aggregate_vs_sequential']}x |")
print("report:", args.out)
