#!/usr/bin/env python
"""Driver benchmark: trains on a synthetic wheat plot on the attached TPU and
reports steady-state training throughput (plus render FPS as a secondary
line on stderr).

Prints ONE JSON line:
  {"metric": "train_iters_per_sec", "value": N, "unit": "it/s",
   "vs_baseline": N/60}
Baseline = 60 train it/s per chip (BASELINE.md north star; the reference
CUDA pipeline budget is 15k iters in <=48h wall on a 24GB GPU).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def wait_tpu_healthy(budget_s: float) -> bool:
    """The remote-TPU attachment can wedge (PJRT init then blocks forever,
    observed for 5+ h on 2026-08-17). Probe it in a SUBPROCESS with a
    timeout so this process never inherits the hang, and wait up to
    ``budget_s`` for driver-side recovery before giving up."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp\n"
             "jax.block_until_ready(jnp.ones((256,256)) @ "
             "jnp.ones((256,256)))\n")
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run([sys.executable, "-c", probe], timeout=120,
                                capture_output=True).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        remaining = deadline - time.time()
        if remaining <= 0:
            return False
        print(f"bench: TPU attachment unresponsive (probe {attempt}); "
              f"retrying for {remaining:.0f}s more", file=sys.stderr)
        time.sleep(min(60.0, max(1.0, remaining)))


def main():
    if not wait_tpu_healthy(float(os.environ.get(
            "WHEAT3DGS_BENCH_TPU_WAIT_S", "1800"))):
        print("bench: TPU attachment is wedged (device init hangs); "
              "no measurement possible on this host right now.",
              file=sys.stderr)
        sys.exit(3)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache", "tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from wheat3dgs_tpu.config import ModelParams, OptimizationParams
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu.scene import Scene
    from wheat3dgs_tpu.training import Trainer

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # Dense scene: ~100k initial points so the steady-state window measures
    # a realistic post-densify population (the round-1 bench measured at
    # 4-21k splats, an order of magnitude under production scenes).
    scene_dir = os.environ.get("WHEAT3DGS_BENCH_SCENE",
                               os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache", "scene_100k"))
    width = int(os.environ.get("WHEAT3DGS_BENCH_W", "1600"))
    height = int(os.environ.get("WHEAT3DGS_BENCH_H", "1200"))
    iters = int(os.environ.get("WHEAT3DGS_BENCH_ITERS", "600"))
    warmup = 100

    if not os.path.exists(os.path.join(scene_dir, "sparse", "0", "points3D.bin")):
        t0 = time.time()
        # points3D ships a 1/2 subsample -> ~100k initial splats.
        make_synthetic_colmap_scene(
            scene_dir, width=width, height=height, n_heads=32,
            pts_per_head=3000, ground_pts=104_000, seed=0, with_masks=False)
        print(f"synthesized scene in {time.time() - t0:.1f}s", file=sys.stderr)

    model = ModelParams(source_path=scene_dir, model_path="", eval=True,
                        resolution=1)
    t0 = time.time()
    scene = Scene(model, sh_degree=3, shuffle=False)
    print(f"scene loaded in {time.time() - t0:.1f}s "
          f"({int(scene.gaussians.num_alive)} splats)", file=sys.stderr)
    w, h = scene.image_size
    from wheat3dgs_tpu.render.pipeline import inference_config

    config = inference_config(RasterConfig(
        max_tiles_per_gauss=16, max_per_tile=512, tile_batch=128))
    # densify_from before warmup ends so the timed window has no first-time
    # compiles for densify/capacity-growth shapes.
    opt = OptimizationParams(iterations=iters, densify_from_iter=20,
                             densify_until_iter=iters - 100,
                             densification_interval=40,
                             opacity_reset_interval=100_000)
    trainer = Trainer(scene.gaussians, opt, scene.cameras_extent,
                      sh_degree=3, config=config)
    trainer.active_sh_degree = trainer.max_sh_degree  # bench at full SH
    gt_images = jnp.asarray(scene.data.train.images)
    n_train = gt_images.shape[0]
    cams = [scene.cam_arrays("train", i) for i in range(n_train)]

    rng = np.random.default_rng(0)
    # Warm-up: covers compiles for all SH degrees reached + densify.
    t0 = time.time()
    for it in range(1, warmup + 1):
        vi = int(rng.integers(n_train))
        m = trainer.step(it, cams[vi], gt_images[vi], w, h)
        if it in (1, warmup):
            jax.block_until_ready(m["loss"])
            print(f"warmup it {it} done at {time.time() - t0:.1f}s",
                  file=sys.stderr)
    # Hold SH degree fixed during the timed window (no new compiles).
    trainer.active_sh_degree = trainer.max_sh_degree
    m = trainer.step(warmup, cams[0], gt_images[0], w, h)  # compile deg-3
    jax.block_until_ready(m["loss"])
    # Pre-compile the next two entry-budget rungs: densification inside the
    # timed window raises the rung and would otherwise pay a first-compile
    # stall mid-measurement (a real 15k-iter run amortizes these).
    c = scene.data.train.cameras
    cam_stacks = (c.w2c, c.full_proj, c.cam_center, c.tanfovx, c.tanfovy)
    WINDOW = 20
    if trainer.config.backend == "pallas":
        import dataclasses as _dc

        from wheat3dgs_tpu.ops.binning import pick_entry_budget

        saved = trainer.config
        rung = saved.entry_budget
        # Pre-compile the scanned WINDOW-block at the current and next two
        # budget rungs (densification raises the rung inside the timed
        # window; the block program's first compile would otherwise stall
        # mid-measurement).
        for _ in range(3):
            m = trainer.step_block(
                warmup, np.zeros(WINDOW, np.int64), cam_stacks, gt_images,
                w, h, n_steps=WINDOW)
            jax.block_until_ready(m["loss"])
            rung = pick_entry_budget(int(rung) + 1, headroom=1.0)
            trainer.config = _dc.replace(saved, entry_budget=rung)
        trainer.config = saved
    # Timed in WINDOW-sized blocks: a per-iteration block_until_ready would
    # add one host<->device round trip per step (tens of ms through the
    # remote-TPU tunnel), which a real training loop never pays — the host
    # only syncs at densify/log boundaries.
    # WINDOW-sized scanned blocks (training.train_step_scan): one device
    # program per window removes the per-step host dispatch (several ms
    # through the remote-TPU tunnel). Blocks end on densify boundaries
    # (interval 40 is a multiple of 20), matching per-step semantics.
    win_times = []
    t_prev = time.time()
    for it0 in range(warmup + 1, iters + 1, WINDOW):
        vis = rng.integers(n_train, size=WINDOW)
        m = trainer.step_block(it0, vis, cam_stacks, gt_images, w, h,
                               n_steps=WINDOW)
        jax.block_until_ready(m["loss"])
        now = time.time()
        win_times.append((now - t_prev) / WINDOW)
        t_prev = now
    n_done = len(win_times) * WINDOW
    total = sum(t * WINDOW for t in win_times)
    # Median per-window time = steady-state throughput; one-time compile
    # stalls (capacity growth, SH ramp) amortize over a real 15k-iter run
    # but would dominate a 500-iter window mean.
    med = float(np.median(win_times))
    mean = total / max(1, len(win_times) * WINDOW)
    ips = 1.0 / med
    print(f"train: {n_done} iters in {total:.2f}s "
          f"(mean {1e3 * mean:.1f} ms, median "
          f"{1e3 * med:.1f} ms -> {ips:.1f} it/s) @{w}x{h}, "
          f"n_alive={int(m['n_alive'])}, psnr={float(m['psnr']):.2f}",
          file=sys.stderr)

    # Secondary: render FPS at full res (stderr only). Measures the
    # forward-only inference path (render_fwd_jit) — the kernel render_sets/
    # render_360/eval/viewer actually run: no custom_vjp residuals, payload
    # sort trimmed to color+depth channels.
    from wheat3dgs_tpu.render.pipeline import (adapt_config, inference_config,
                                               render_fwd_jit)

    # Rotate through the training cameras (not one camera repeated) so the
    # FPS reflects view-dependent occupancy/sort-size variance; budget sized
    # over several probe views so no frame overflows (VERDICT r4 weak #7).
    config = adapt_config(trainer.state, cams[0], w, h,
                          inference_config(config),
                          cams=[cams[i] for i in range(0, n_train, 4)])
    out = render_fwd_jit(trainer.state, *cams[0], w, h, sh_degree=3,
                         config=config)
    jax.block_until_ready(out.color)
    t0 = time.time()
    reps = 30
    for r in range(reps):
        out = render_fwd_jit(trainer.state, *cams[r % n_train], w, h,
                             sh_degree=3, config=config)
    jax.block_until_ready(out.color)
    fps = reps / (time.time() - t0)
    print(f"render: {fps:.1f} FPS @{w}x{h} (forward-only inference path)",
          file=sys.stderr)

    print(json.dumps({"metric": "train_iters_per_sec", "value": round(ips, 2),
                      "unit": "it/s", "vs_baseline": round(ips / 60.0, 3),
                      "mean_ms": round(1e3 * mean, 1),
                      "median_ms": round(1e3 * med, 1),
                      "n_splats": int(m["n_alive"]),
                      "render_fps": round(fps, 1)}))


if __name__ == "__main__":
    main()
