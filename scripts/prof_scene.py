"""Stage profile on the real bench scene (dense synthetic wheat plot),
after a short training burn-in so occupancy reflects steady state."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from wheat3dgs_tpu.config import ModelParams, OptimizationParams
from wheat3dgs_tpu.ops import pallas_raster as PR
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.render.pipeline import RasterConfig, inference_config, render
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer
from wheat3dgs_tpu.ops.losses import l1_loss, ssim

SCENE = os.environ.get("WHEAT3DGS_BENCH_SCENE", "/tmp/wheat3dgs_bench_scene_100k")
BURN = int(os.environ.get("BURN", "300"))
W, H, SH, MTPG, TILE = 1600, 1200, 3, 16, 32

model = ModelParams(source_path=SCENE, model_path="", eval=True, resolution=1)
scene = Scene(model, sh_degree=SH, shuffle=False)
w, h = scene.image_size
config = inference_config(RasterConfig(max_tiles_per_gauss=MTPG,
                                       max_per_tile=512, tile_batch=128))
opt = OptimizationParams(iterations=BURN + 10, densify_from_iter=20,
                         densify_until_iter=BURN - 50,
                         densification_interval=40,
                         opacity_reset_interval=100_000)
trainer = Trainer(scene.gaussians, opt, scene.cameras_extent, sh_degree=SH,
                  config=config)
trainer.active_sh_degree = SH
gt_images = jnp.asarray(scene.data.train.images)
n_train = gt_images.shape[0]
cams = [scene.cam_arrays("train", i) for i in range(n_train)]
CKPT = "/tmp/prof_burnin_state.npz"
if os.path.exists(CKPT):
    from wheat3dgs_tpu.models.gaussians import grow_capacity
    from wheat3dgs_tpu.models.serialization import load_checkpoint

    tpl = trainer.state
    if tpl.capacity < 262144:
        tpl = grow_capacity(tpl, 262144)
    trainer.state, _ = load_checkpoint(CKPT, tpl)
    trainer._occupancy_due = True
    trainer._refresh_occupancy(cams[0], w, h)
    print("loaded cached burn-in state", file=sys.stderr)
else:
    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(1, BURN + 1):
        vi = int(rng.integers(n_train))
        m = trainer.step(it, cams[vi], gt_images[vi], w, h)
    jax.block_until_ready(m["loss"])
    print(f"burn-in {BURN} iters in {time.time() - t0:.1f}s, "
          f"alive={int(m['n_alive'])}, psnr={float(m['psnr']):.2f}, "
          f"mtpg={trainer.config.max_tiles_per_gauss}", file=sys.stderr)
    from wheat3dgs_tpu.models.serialization import save_checkpoint

    save_checkpoint(trainer.state, BURN, CKPT)

state = trainer.state
MTPG = trainer.config.max_tiles_per_gauss
BUDGET = trainer.config.entry_budget
print(f"trainer config: mtpg={MTPG} entry_budget={BUDGET}", file=sys.stderr)
cam = cams[0]
gt = gt_images[0]


def bench(name, fn, *args, reps=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


def proj(state, w2c, fp, cc, tfx, tfy):
    return project_gaussians(
        state.params.means, state.scales(), state.params.quats,
        state.opacity(), w2c, fp, cc, tfx, tfy, W, H,
        sh=state.sh(), sh_degree=SH)

splats = bench("projection+SH", proj, state, *cam)
vis = int((np.asarray(splats.radius) > 0).sum())
print(f"  visible: {vis}/{state.capacity}")

from wheat3dgs_tpu.ops.binning import num_tiles as _nt2
_tx2, _ty2 = _nt2(W, H, TILE)
T_TOTAL = _tx2 * _ty2

bench("expand keys", lambda sp: PR._expand_keys(sp, W, H, TILE, MTPG),
      splats)

stream = bench(
    "sorted stream (2-op sort+slice+gather)",
    lambda sp: PR._sorted_stream(
        PR.pack_splats(sp), PR._expand_keys(sp, W, H, TILE, MTPG),
        T_TOTAL, MTPG, 3, BUDGET),
    splats)
_, starts, ends, real, sorig, _ = stream
cnt = np.asarray(ends) - np.asarray(starts)
print(f"  tiles={cnt.size} mean={cnt.mean():.0f} max={cnt.max()} "
      f"total={cnt.sum()} E={sorig.shape[0]}")

bench("raster fwd (full)",
      lambda sp: PR.rasterize_pallas(sp, W, H, tile=TILE,
                                     max_tiles_per_gauss=MTPG,
                                     entry_budget=BUDGET).color, splats)

comp = PR._composite_fns(_tx2, T_TOTAL, TILE, 3, MTPG, False,
                         state.capacity, BUDGET, False)
keys0 = jax.jit(lambda sp: PR._expand_keys(sp, W, H, TILE, MTPG))(splats)
packed0 = jax.jit(PR.pack_splats)(splats)
jax.block_until_ready((keys0, packed0))


def comp_vjp(packed, *keys):
    out, vjp = jax.vjp(lambda p: comp(p, *keys), packed)
    return vjp(jnp.ones_like(out))[0]

bench("composite bwd (kernel+reduction, incl fwd)", comp_vjp, packed0,
      *keys0)

cfg2 = trainer.config


def render_fwd(state, w2c, fp, cc, tfx, tfy):
    return render(state, w2c, fp, cc, tfx, tfy, W, H, SH, config=cfg2).color

bench("render fwd", render_fwd, state, *cam)


def loss_grad(state, w2c, fp, cc, tfx, tfy):
    import dataclasses as dc

    def f(params):
        s = dc.replace(state, params=params)
        out = render(s, w2c, fp, cc, tfx, tfy, W, H, SH, config=cfg2)
        return 0.8 * l1_loss(out.color, gt) + 0.2 * (1 - ssim(out.color, gt))
    return jax.grad(f)(state.params)

bench("render+loss fwd+bwd", loss_grad, state, *cam)

from wheat3dgs_tpu.training import train_step

sstate = state


def step_fn(s):
    return train_step(s, *cam, gt, jnp.zeros(3), jnp.int32(1000),
                      sh_degree=SH, width=W, height=H, opt=opt, config=cfg2)

new_state, metrics = step_fn(sstate)
jax.block_until_ready(metrics["loss"])
t0 = time.perf_counter()
s = new_state
for _ in range(10):
    s, metrics = step_fn(s)
jax.block_until_ready(metrics["loss"])
print(f"{'full train_step':44s} {(time.perf_counter() - t0) / 10 * 1e3:8.2f} ms")
