#!/usr/bin/env python
"""Time the round-5 device-resident seg fast path on the envelope model."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
print("alive:", int(scene.gaussians.num_alive), flush=True)
w0, h0 = scene.image_size
n_train = len(scene.data.train.metas)
config = adapt_config(
    scene.gaussians, scene.cam_arrays("train", 0), w0, h0,
    inference_config(RasterConfig()),
    cams=[scene.cam_arrays("train", i) for i in range(n_train)])
ctx = build_context(scene, config)

state = ctx.state
means_z = np.asarray(state.params.means[:, 2])
alive = np.asarray(state.alive)
pts_filter = (means_z < means_z[alive].mean()) | ~alive

t0 = time.time()
ctx._ensure_device()
print(f"ensure_device (mask bits -> HBM): {time.time()-t0:.1f}s "
      f"shape={ctx.mask_bits_np.shape} seg_budget={ctx.seg_budget}",
      flush=True)

t0 = time.time()
counts = ctx.cached_counts(0, ctx.mask_paths[0][0])
print(f"first-touch camera lift (incl. compile): {time.time()-t0:.1f}s",
      flush=True)
t0 = time.time()
counts = ctx.cached_counts(0, ctx.mask_paths[0][1])
print(f"cached lookup: {(time.time()-t0)*1000:.1f} ms", flush=True)
t0 = time.time()
ctx.cached_counts(1, ctx.mask_paths[1][0])
print(f"second camera lift (warm jit): {time.time()-t0:.1f}s", flush=True)

counts[1:, pts_filter] = 0.0
cands = list(range(1, len(ctx.image_names)))
t0 = time.time()
used, mi, mp = seg.find_match_device(ctx, cands, counts, 0.6)
print(f"find_match_device first (incl. compile): {time.time()-t0:.1f}s; "
      f"used={used.sum()} matches={len(mi)}", flush=True)
for i in range(3):
    t0 = time.time()
    used, mi, mp = seg.find_match_device(ctx, cands, counts, 0.6)
    print(f"find_match_device warm: {(time.time()-t0)*1000:.0f} ms",
          flush=True)

t0 = time.time()
pb = ctx.predbits_device(used)
print(f"predbits_device first (incl. compile): {time.time()-t0:.1f}s "
      f"{pb.shape}", flush=True)
t0 = time.time()
pb = ctx.predbits_device(used)
print(f"predbits_device warm: {(time.time()-t0)*1000:.0f} ms", flush=True)
