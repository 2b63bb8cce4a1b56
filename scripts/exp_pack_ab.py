#!/usr/bin/env python
"""Single-process on-chip A/B of RasterConfig.pack_payload (bf16-pair-packed
entry-sort payload) on the bench scene: train window it/s, fwd-only render
FPS, and forward parity (PSNR packed vs unpacked on the same state/camera).

pack_payload rides RasterConfig (static under jit, commit 8b60ae0), so both
variants compile side by side in one process — no env vars, no subprocesses,
and the shared burn-in state makes the comparison exact.

Usage: python scripts/exp_pack_ab.py [--burn 200] [--win 20] [--reps 4]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--burn", type=int, default=200)
ap.add_argument("--win", type=int, default=20)
ap.add_argument("--reps", type=int, default=4)
ap.add_argument("--freps", type=int, default=24)
args = ap.parse_args()

import jax
import jax.numpy as jnp

from wheat3dgs_tpu.config import ModelParams, OptimizationParams
from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                           inference_config, render_fwd_jit)
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer, train_step_scan

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCENE = os.path.join(REPO, ".bench_cache", "scene_100k")
W, H, SH = 1600, 1200, 3

model = ModelParams(source_path=SCENE, model_path="", eval=True, resolution=1)
scene = Scene(model, sh_degree=SH, shuffle=False)
config = inference_config(RasterConfig(max_per_tile=512, tile_batch=128))
opt = OptimizationParams(iterations=1000, densify_from_iter=20,
                         densify_until_iter=150, densification_interval=40,
                         opacity_reset_interval=100_000)
trainer = Trainer(scene.gaussians, opt, scene.cameras_extent, sh_degree=SH,
                  config=config)
trainer.active_sh_degree = SH
gt_images = jnp.asarray(scene.data.train.images)
cams = [scene.cam_arrays("train", i) for i in range(gt_images.shape[0])]
rng = np.random.default_rng(0)
t0 = time.time()
for it in range(1, args.burn + 1):
    vi = int(rng.integers(len(cams)))
    m = trainer.step(it, cams[vi], gt_images[vi], W, H)
jax.block_until_ready(m["loss"])
print(f"burn-in {args.burn} iters in {time.time() - t0:.0f}s "
      f"(n_alive={int(m['n_alive'])})", file=sys.stderr)
state = trainer.state

stacks = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
w2c_s, fp_s, cc_s, tfx_s, tfy_s = stacks
vi_rot = jnp.asarray(rng.integers(len(cams), size=args.win), jnp.int32)
results = {}
for pack in (False, True):
    cfg = dataclasses.replace(trainer.config, pack_payload=pack)

    def window(st, cfg=cfg):
        return train_step_scan(
            st, w2c_s, fp_s, cc_s, jnp.asarray(tfx_s), jnp.asarray(tfy_s),
            gt_images, vi_rot, jnp.zeros(3, jnp.float32), jnp.int32(1000),
            n_steps=args.win, sh_degree=SH, width=W, height=H, opt=opt,
            config=cfg)

    # train_step_scan DONATES its state arg — thread the result forward
    # (bench.py does the same); re-passing a donated buffer is an
    # INVALID_ARGUMENT on the axon backend. Work on a copy so the shared
    # burn-in state survives for the other combo + the parity render.
    st2, m2 = window(jax.tree.map(jnp.copy, state))
    jax.block_until_ready(m2["loss"])            # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.reps):
        st2, m2 = window(st2)
    jax.block_until_ready(m2["loss"])
    train_ms = (time.perf_counter() - t0) / args.reps / args.win * 1e3

    rcfg = adapt_config(state, cams[0], W, H,
                        dataclasses.replace(inference_config(cfg),
                                            pack_payload=pack),
                        cams=cams[::4])
    out = render_fwd_jit(state, *cams[0], W, H, sh_degree=SH, config=rcfg)
    jax.block_until_ready(out.color)
    t0 = time.perf_counter()
    for r in range(args.freps):
        out = render_fwd_jit(state, *cams[r % len(cams)], W, H, sh_degree=SH,
                             config=rcfg)
    jax.block_until_ready(out.color)
    fps = args.freps / (time.perf_counter() - t0)
    ref = render_fwd_jit(state, *cams[0], W, H, sh_degree=SH, config=rcfg)
    results[pack] = {"train_ms": round(train_ms, 2),
                     "it_per_s": round(1e3 / train_ms, 2),
                     "render_fps": round(fps, 1),
                     "color0": np.asarray(ref.color)}
    print(f"pack={int(pack)}: {train_ms:.1f} ms/step "
          f"({1e3 / train_ms:.2f} it/s), {fps:.1f} FPS", file=sys.stderr)

mse = float(np.mean((results[False]["color0"]
                     - results[True]["color0"]) ** 2))
psnr = 99.0 if mse < 1e-12 else float(20 * -np.log10(np.sqrt(mse)))
line = {"packed_vs_unpacked_psnr_db": round(psnr, 1)}
for pack in (False, True):
    r = results[pack]
    line[f"pack{int(pack)}"] = {k: v for k, v in r.items() if k != "color0"}
print("PACKAB " + json.dumps(line))
with open("/tmp/pack_ab.json", "w") as f:
    json.dump(line, f, indent=1)
