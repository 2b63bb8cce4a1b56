#!/usr/bin/env python
"""Diagnose the 7k->30k test-PSNR decline seen in benchmark config #2.

Round-3 observation (docs/REPORT.md BENCH2): test PSNR 37.98 @7k ->
37.03 @15k -> 35.64 @30k on the dense synthetic plot, while the reference
schedule on real data improves over that range. Hypotheses:

  H1 overfit: 30 synthetic train views / 6 test views, training far past
     convergence (train PSNR ~47 at bench steady state) -> train PSNR keeps
     rising while test falls;
  H2 budget cropping: late-training renders silently cropped entries
     (ruled out per-render by entries_total telemetry, checked here);
  H3 schedule interaction (densify/opacity-reset artifacts): would show as
     train AND test falling together.

This script renders BOTH splits from each saved iteration with a
freshly-probed entry budget over all split views, reports per-split PSNR +
the max allocation-demand/budget ratio, and prints the verdict table.

Usage: python scripts/diag_psnr_decline.py [-m /tmp/wheat3dgs_bench2_model]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from wheat3dgs_tpu.config import ModelParams
from wheat3dgs_tpu.ops.losses import psnr
from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                           inference_config, render_fwd_jit)
from wheat3dgs_tpu.scene import Scene

ap = argparse.ArgumentParser()
ap.add_argument("-m", "--model_path", default="/tmp/wheat3dgs_bench2_model")
ap.add_argument("-s", "--source_path", default=None,
                help="defaults to the source_path recorded in cfg_args")
ap.add_argument("--iterations", type=int, nargs="+",
                default=[7000, 15000, 30000])
args = ap.parse_args()

if args.source_path is None:
    # cfg_args stores the training-time namespace (reference
    # arguments/__init__.py:92-112 round-trip).
    import re
    cfg = open(os.path.join(args.model_path, "cfg_args")).read()
    args.source_path = re.search(r"source_path='([^']*)'", cfg).group(1)

rows = []
for it in args.iterations:
    model = ModelParams(source_path=args.source_path,
                        model_path=args.model_path,
                        eval=True, resolution=1)
    scene = Scene(model, load_iteration=it, shuffle=False)
    w, h = scene.image_size
    out_row = {"iteration": it,
               "n_splats": int(scene.gaussians.num_alive)}
    for split in ("train", "test"):
        group = scene.data.train if split == "train" else scene.data.test
        n = len(group.metas)
        cams = [scene.cam_arrays(split, i) for i in range(n)]
        config = adapt_config(scene.gaussians, cams[0], w, h,
                              inference_config(RasterConfig()), cams=cams)
        vals, crop = [], 0.0
        for i in range(n):
            out = render_fwd_jit(scene.gaussians, *cams[i], w, h,
                                 sh_degree=scene.sh_degree,
                                 config=config)
            vals.append(float(psnr(jnp.clip(out.color, 0, 1),
                                   jnp.asarray(group.images[i]))))
            if out.entries_total is not None:
                crop = max(crop, float(out.entries_total)
                           / config.entry_budget)
        out_row[f"{split}_psnr"] = float(np.mean(vals))
        out_row[f"{split}_demand_over_budget"] = round(crop, 3)
    rows.append(out_row)
    print(out_row, flush=True)

print("\n| iteration | n_splats | train PSNR | test PSNR | max demand/budget |")
print("|---|---|---|---|---|")
for r in rows:
    print(f"| {r['iteration']} | {r['n_splats']} | "
          f"{r['train_psnr']:.2f} | {r['test_psnr']:.2f} | "
          f"{max(r['train_demand_over_budget'], r['test_demand_over_budget']):.2f} |")

tr = [r["train_psnr"] for r in rows]
te = [r["test_psnr"] for r in rows]
if tr[-1] > tr[0] + 0.3 and te[-1] < te[0] - 0.3:
    print("\nVERDICT: train PSNR rises while test falls -> synthetic-data "
          "overfit (H1); no budget cropping observed."
          if all(max(r["train_demand_over_budget"],
                     r["test_demand_over_budget"]) <= 1.0 for r in rows)
          else "\nVERDICT: overfit signature, BUT budget cropping also "
               "observed — fix the ladder first (H2).")
elif te[-1] < te[0] - 0.3 and tr[-1] <= tr[0] + 0.3:
    print("\nVERDICT: train and test both degrade -> schedule interaction "
          "(H3): bisect densify/opacity-reset events.")
else:
    print("\nVERDICT: no decline reproduced under fresh budgets -> the "
          "round-3 numbers were a stale-budget artifact (H2).")
