"""Micro-profile of the train-step constituents on the attached TPU.

Times each stage at a realistic post-densify population so round-2
optimization targets the real bottleneck.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from wheat3dgs_tpu.models import gaussians as G
from wheat3dgs_tpu.testing import random_gaussians, look_at_camera
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.ops import pallas_raster as PR
from wheat3dgs_tpu.ops.losses import l1_loss, ssim
from wheat3dgs_tpu.render.pipeline import RasterConfig, render
from wheat3dgs_tpu.config import OptimizationParams
from wheat3dgs_tpu.training import train_step

N = 131072
W, H = 1600, 1200
SH = 3
MTPG = 16
TILE = 32

g = random_gaussians(n=N, seed=0, spread=1.5, sh_degree=SH)
params = G.GaussianParams(
    means=jnp.asarray(g["means3d"]), quats=jnp.asarray(g["quats"]),
    log_scales=jnp.asarray(np.log(g["scales"] * 0.3)),
    sh_dc=jnp.asarray(g["sh"][:, :1]), sh_rest=jnp.asarray(g["sh"][:, 1:]),
    opacity_logit=jnp.full((N,), 0.5, jnp.float32))
state = G.init_state(params, capacity=N)
cam = look_at_camera(width=W, height=H, eye=(4.0, 2.0, -4.0))
cams = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
        jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
        jnp.float32(cam.tanfovy))


def bench(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:36s} {dt * 1e3:8.2f} ms")
    return out


# --- stage 1: projection ---
@jax.jit
def proj(state, w2c, fp, cc, tfx, tfy):
    return project_gaussians(
        state.params.means, state.scales(), state.params.quats,
        state.opacity(), w2c, fp, cc, tfx, tfy, W, H,
        sh=state.sh(), sh_degree=SH)

splats = bench("projection+SH", proj, state, *cams)
vis = int((np.asarray(splats.radius) > 0).sum())
print(f"  visible: {vis}/{N}")

# --- stage 2: entry stream (sort + segment bounds) ---
@jax.jit
def entry_stream(splats):
    return PR._entry_stream(splats, W, H, TILE, MTPG)

gauss, starts, ends, real, sorig = bench(
    "entry_stream (sort+bounds)", entry_stream, splats)
cnp = np.asarray(ends) - np.asarray(starts)
print(f"  E_pad={gauss.shape[0]}, tiles={cnp.size}, "
      f"mean count={cnp.mean():.0f}, max={cnp.max()}, total={cnp.sum()}")

@jax.jit
def entries_fwd_only(splats):
    g, s, e, _, _ = PR._entry_stream(splats, W, H, TILE, MTPG)
    return g, s, e

bench("entry_stream fwd-only slice", entries_fwd_only, splats)

# --- stage 3: entry gather ---
@jax.jit
def gather(splats):
    g, s, e, _, _ = PR._entry_stream(splats, W, H, TILE, MTPG)
    return PR._entry_table(PR.pack_splats(splats), g)

bench("entry gather (incl stream fwd)", gather, splats)

# --- stage 4: forward composite kernel (full raster fwd) ---
@jax.jit
def fwd(splats):
    return PR.rasterize_pallas(splats, W, H, tile=TILE,
                               max_tiles_per_gauss=MTPG).color

bench("rasterize_pallas fwd (incl 1-3)", fwd, splats)

# --- stage 5: full render fwd (proj+raster) ---
cfg = RasterConfig(max_tiles_per_gauss=MTPG, backend="pallas")
@jax.jit
def render_fwd(state, w2c, fp, cc, tfx, tfy):
    return render(state, w2c, fp, cc, tfx, tfy, W, H, SH, config=cfg).color

bench("render fwd (proj+raster)", render_fwd, state, *cams)

# --- stage 6: render + loss backward ---
gt = jnp.zeros((3, H, W), jnp.float32) + 0.3

@jax.jit
def loss_grad(state, w2c, fp, cc, tfx, tfy):
    def f(params):
        s = state.replace(params=params) if hasattr(state, "replace") else None
        import dataclasses as dc
        s = dc.replace(state, params=params)
        out = render(s, w2c, fp, cc, tfx, tfy, W, H, SH, config=cfg)
        return 0.8 * l1_loss(out.color, gt) + 0.2 * (1 - ssim(out.color, gt))
    return jax.grad(f)(state.params)

bench("render+loss fwd+bwd", loss_grad, state, *cams)

# --- stage 6b: raster-only fwd+bwd (no loss, sum cotangent) ---
from wheat3dgs_tpu.ops.projection import Splats2D

@jax.jit
def raster_grad(splats):
    def f(xy, conic, color, opacity, depth):
        sp = Splats2D(xy=xy, depth=depth, conic=conic,
                      radius=splats.radius, color=color, opacity=opacity)
        out = PR.rasterize_pallas(sp, W, H, tile=TILE,
                                  max_tiles_per_gauss=MTPG)
        return out.color.sum() + out.alpha.sum()
    return jax.grad(f, argnums=(0, 1, 2, 3))(
        splats.xy, splats.conic, splats.color, splats.opacity, splats.depth)

bench("raster fwd+bwd (sum cotangent)", raster_grad, splats)

# --- stage 6c: composite bwd alone (kernel + sort reduction) ---
from wheat3dgs_tpu.ops.binning import num_tiles as _nt
_tx, _ty = _nt(W, H, TILE)
comp = PR._composite_fns(_tx, _tx * _ty, TILE, 3, MTPG, False)
stream = jax.jit(lambda sp: PR._entry_stream(sp, W, H, TILE, MTPG))(splats)
packed0 = jax.jit(lambda sp: PR.pack_splats(sp))(splats)
jax.block_until_ready((stream, packed0))

@jax.jit
def comp_vjp(packed, gauss, starts, ends, real, sorig):
    out, vjp = jax.vjp(
        lambda p: comp(p, gauss, starts, ends, real, sorig), packed)
    return vjp(jnp.ones_like(out))[0]

bench("composite bwd (kernel + reduction)", comp_vjp, packed0, *stream)

# --- stage 7: ssim alone fwd+bwd ---
@jax.jit
def ssim_grad(img):
    return jax.grad(lambda x: ssim(x, gt))(img)

img = jnp.zeros((3, H, W), jnp.float32) + 0.31
bench("ssim fwd+bwd", ssim_grad, img)

# --- stage 7b: train-step epilogue pieces (adam + densify stats) ---
from wheat3dgs_tpu.models.optim import adam_step
from wheat3dgs_tpu.training import lr_tree

@jax.jit
def adam_only(state):
    grads = jax.tree.map(jnp.ones_like, state.params)
    lrs = lr_tree(state.params, jnp.int32(1000), OptimizationParams(), 1.0)
    new_p, new_a = adam_step(state.adam, grads, state.params, lrs)
    return new_p.means

bench("adam epilogue", adam_only, state)

@jax.jit
def dstats(state):
    s = G.add_densification_stats(
        state, jnp.ones((N, 2), jnp.float32),
        jnp.ones((N,), jnp.int32))
    return s.grad_accum

bench("densification stats", dstats, state)

# --- stage 8: full train step ---
opt = OptimizationParams()
m = None
def step_fn(state):
    return train_step(state, *cams, gt, jnp.zeros(3), jnp.int32(1000),
                      sh_degree=SH, width=W, height=H, opt=opt, config=cfg)

# train_step donates state; re-feed returned state
new_state, metrics = step_fn(state)
jax.block_until_ready(metrics["loss"])
t0 = time.perf_counter()
reps = 20
s = new_state
for _ in range(reps):
    s, metrics = step_fn(s)
jax.block_until_ready(metrics["loss"])
print(f"{'full train_step':36s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
