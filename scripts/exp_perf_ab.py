"""On-chip A/B of the round-5 perf knobs (run when the TPU is idle).

Measures, on the bench scene at the 1600x1200 / ~100k-splat envelope:
  - train step (train_step_scan window, bench-identical) and
  - forward-only render frame (render_fwd_jit, rotating cameras)
for every combination of
  W3_TRI_MODE       in {f32, bf16}   (per-chunk prefix matmul precision)
  W3_PACK_PAYLOAD   in {0, 1}        (bf16-pair-packed entry-sort payload)

Each combo runs in a SUBPROCESS: both knobs are read at kernel build /
trace time, so a fresh process guarantees no stale jit cache entries.
Prints a markdown table + JSON lines for fill_report.
"""
import itertools
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, functools, dataclasses
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(%(repo)r, ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from wheat3dgs_tpu.config import ModelParams, OptimizationParams
from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                           inference_config, render_fwd_jit)
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer, train_step_scan

SCENE = os.path.join(%(repo)r, ".bench_cache", "scene_100k")
W, H, SH = 1600, 1200, 3
model = ModelParams(source_path=SCENE, model_path="", eval=True, resolution=1)
scene = Scene(model, sh_degree=SH, shuffle=False)
config = inference_config(RasterConfig(max_per_tile=512, tile_batch=128))
opt = OptimizationParams(iterations=1000, densify_from_iter=20,
                         densify_until_iter=250, densification_interval=40,
                         opacity_reset_interval=100_000)
trainer = Trainer(scene.gaussians, opt, scene.cameras_extent, sh_degree=SH,
                  config=config)
trainer.active_sh_degree = SH
gt_images = jnp.asarray(scene.data.train.images)
cams = [scene.cam_arrays("train", i) for i in range(gt_images.shape[0])]
rng = np.random.default_rng(0)
for it in range(1, 301):           # burn-in to steady-state splat count
    vi = int(rng.integers(len(cams)))
    m = trainer.step(it, cams[vi], gt_images[vi], W, H)
jax.block_until_ready(m["loss"])
state = trainer.state

WIN = 20
stacks = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
w2c_s, fp_s, cc_s, tfx_s, tfy_s = stacks
vi_rot = jnp.asarray(rng.integers(len(cams), size=WIN), jnp.int32)
cfg = trainer.config            # budget already adapted during burn-in
def window(st):
    return train_step_scan(
        st, w2c_s, fp_s, cc_s, jnp.asarray(tfx_s), jnp.asarray(tfy_s),
        gt_images, vi_rot, jnp.zeros(3, jnp.float32), jnp.int32(1000),
        n_steps=WIN, sh_degree=SH, width=W, height=H, opt=opt, config=cfg)
# train_step_scan DONATES its state arg — thread the scanned state forward
# (bench.py does the same); re-passing a donated buffer surfaces as
# INVALID_ARGUMENT on the axon backend.
st2, m2 = window(jax.tree.map(jnp.copy, state))
jax.block_until_ready(m2["loss"])
t0 = time.perf_counter()
REPS = 5
for _ in range(REPS):
    st2, m2 = window(st2)
jax.block_until_ready(m2["loss"])
train_ms = (time.perf_counter() - t0) / REPS / WIN * 1e3

rcfg = adapt_config(state, cams[0], W, H, inference_config(cfg),
                    cams=cams[::4])
out = render_fwd_jit(state, *cams[0], W, H, sh_degree=SH, config=rcfg)
jax.block_until_ready(out.color)
t0 = time.perf_counter()
FREPS = 30
for r in range(FREPS):
    out = render_fwd_jit(state, *cams[r %% len(cams)], W, H, sh_degree=SH,
                         config=rcfg)
jax.block_until_ready(out.color)
fps = FREPS / (time.perf_counter() - t0)
psnr = float(m2["psnr"])
print("ABRESULT " + __import__("json").dumps(
    {"train_ms": round(train_ms, 2), "it_per_s": round(1e3 / train_ms, 2),
     "render_fps": round(fps, 1), "psnr": round(psnr, 2),
     "n_alive": int(m2["n_alive"])}))
"""


def main():
    results = []
    # W3_AB_COMBOS="f32:1,bf16:1" restricts the sweep (default: full grid).
    sel = os.environ.get("W3_AB_COMBOS")
    combos = ([tuple(c.split(":")) for c in sel.split(",")] if sel
              else list(itertools.product(("f32", "bf16"), ("0", "1"))))
    for tri, pack in combos:
        env = dict(os.environ, W3_TRI_MODE=tri, W3_PACK_PAYLOAD=pack)
        print(f"=== tri={tri} pack={pack} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, "-c", CHILD % {"repo": REPO}],
            env=env, capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("ABRESULT ")), None)
        if line is None:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"combo tri={tri} pack={pack} failed")
        r = json.loads(line[len("ABRESULT "):])
        r.update(tri=tri, pack=pack)
        results.append(r)
        print(json.dumps(r), flush=True)

    print("\n| tri | pack | step ms | it/s | render FPS | psnr |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(f"| {r['tri']} | {r['pack']} | {r['train_ms']} | "
              f"{r['it_per_s']} | {r['render_fps']} | {r['psnr']} |")
    with open("/tmp/perf_ab.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
