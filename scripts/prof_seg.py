#!/usr/bin/env python
"""Per-component timing of the seg pipeline on a trained model (round-5).

Loads the envelope model, builds the SegContext exactly as run_3d_seg does,
then times: lift_counts (XLA composite), alpha_all_views (36-view Pallas
fwd render), counts_to_used_mask, and find_match's host matching, to decide
where the per-mask wall time goes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from wheat3dgs_tpu import config as cfg
from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                           inference_config)
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.apps.run_3d_seg_app import build_context
from wheat3dgs_tpu.seg import pipeline as seg

SCENE = os.environ.get("SEG_SCENE", "/tmp/wheat3dgs_segenv_scene")
MODEL = os.environ.get("SEG_MODEL", "/tmp/wheat3dgs_segenv_model")

model = cfg.ModelParams(source_path=SCENE, model_path=MODEL, eval=True,
                        resolution=1)
scene = Scene(model, load_iteration=-1, shuffle=False)
print("alive:", int(scene.gaussians.num_alive), "cap:",
      scene.gaussians.capacity, flush=True)
w0, h0 = scene.image_size
n_train = len(scene.data.train.metas)
t0 = time.time()
config = adapt_config(
    scene.gaussians, scene.cam_arrays("train", 0), w0, h0,
    inference_config(RasterConfig()),
    cams=[scene.cam_arrays("train", i) for i in range(n_train)])
print(f"adapt_config: {time.time()-t0:.1f}s budget={config.entry_budget}",
      flush=True)
ctx = build_context(scene, config)

state = ctx.state
means_z = np.asarray(state.params.means[:, 2])
alive = np.asarray(state.alive)
pts_filter = (means_z < means_z[alive].mean()) | ~alive

cam_i = 0
path = ctx.mask_paths[cam_i][0]

def timeit(label, fn, n=3):
    fn()  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    dt = (time.time() - t0) / n
    print(f"{label}: {dt*1000:.1f} ms", flush=True)
    return out

counts = timeit("lift_counts (1 view, XLA composite)",
                lambda: seg.lift_counts(ctx, cam_i, path, pts_filter))
used = timeit("counts_to_used_mask",
              lambda: seg.counts_to_used_mask(counts))
print("used.sum:", used.sum(), flush=True)
alphas = timeit("alpha_all_views (36 views, pallas fwd)",
                lambda: seg.alpha_all_views(ctx, used))
cands = [i for i in range(len(ctx.image_names)) if i != cam_i]
t0 = time.time()
mi, mp, _ = seg.find_match(ctx, cands, used, 0.6, alphas=alphas)
print(f"find_match host part (alphas given): {(time.time()-t0)*1000:.1f} ms; "
      f"{len(mi)} matches", flush=True)
# mask decode cost (cold cache was paid above; measure warm)
t0 = time.time()
for p in ctx.mask_paths[1][:10]:
    ctx.get_mask(p)
print(f"get_mask warm x10: {(time.time()-t0)*1000:.1f} ms", flush=True)
