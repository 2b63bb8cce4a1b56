"""Composed-prefix profile of the full Pallas train step on the bench scene.

Isolated microbenches lie on this TPU attachment; every row here times a
jitted PREFIX of the real step so each increment is attributable:

  A projection
  B +exact-entry allocation + precise cull keys
  C +phase-1 sort (key, slot)
  D +payload gather (_sorted_stream)
  E +forward kernel               (= full render forward)
  F full loss forward (L1+SSIM)
  G full value_and_grad           (adds bwd kernel + reduction)
  I grad L1-only (isolates SSIM bwd)

Usage: python scripts/prof_step.py [--budget 0] [--fresh]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from wheat3dgs_tpu.config import ModelParams, OptimizationParams
from wheat3dgs_tpu.models.serialization import load_checkpoint, save_checkpoint
from wheat3dgs_tpu.ops import pallas_raster as PR
from wheat3dgs_tpu.ops.binning import num_tiles, pick_entry_budget
from wheat3dgs_tpu.ops.losses import l1_loss, ssim
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.ops.raster import pack_splats
from wheat3dgs_tpu.render.pipeline import RasterConfig, inference_config
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer, entry_demand_probe

SCENE = os.environ.get("WHEAT3DGS_BENCH_SCENE", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "scene_100k"))
CKPT = "/tmp/prof_burnin_state.npz"
W, H, SH, TILE = 1600, 1200, 3, 32

ap = argparse.ArgumentParser()
ap.add_argument("--budget", type=int, default=0, help="0 = probe-picked")
ap.add_argument("--fresh", action="store_true", help="redo burn-in")
ap.add_argument("--reps", type=int, default=10)
args = ap.parse_args()

if not os.path.exists(os.path.join(SCENE, "sparse", "0", "points3D.bin")):
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene
    t0 = time.time()
    make_synthetic_colmap_scene(SCENE, width=W, height=H, n_heads=32,
                                pts_per_head=3000, ground_pts=104_000,
                                seed=0, with_masks=False)
    print(f"synthesized scene in {time.time() - t0:.1f}s", file=sys.stderr)

model = ModelParams(source_path=SCENE, model_path="", eval=True, resolution=1)
scene = Scene(model, sh_degree=SH, shuffle=False)
w, h = scene.image_size
config = inference_config(RasterConfig(max_per_tile=512, tile_batch=128))
opt = OptimizationParams(iterations=310, densify_from_iter=20,
                         densify_until_iter=250, densification_interval=40,
                         opacity_reset_interval=100_000)
trainer = Trainer(scene.gaussians, opt, scene.cameras_extent, sh_degree=SH,
                  config=config)
trainer.active_sh_degree = SH
gt_images = jnp.asarray(scene.data.train.images)
cams = [scene.cam_arrays("train", i) for i in range(gt_images.shape[0])]

if os.path.exists(CKPT) and not args.fresh:
    from wheat3dgs_tpu.models.gaussians import grow_capacity
    tpl = trainer.state
    if tpl.capacity < 262144:
        tpl = grow_capacity(tpl, 262144)
    state, _ = load_checkpoint(CKPT, tpl)
    print("loaded cached burn-in state", file=sys.stderr)
else:
    rng = np.random.default_rng(0)
    t0 = time.time()
    for it in range(1, 301):
        vi = int(rng.integers(len(cams)))
        m = trainer.step(it, cams[vi], gt_images[vi], w, h)
    jax.block_until_ready(m["loss"])
    print(f"burn-in in {time.time() - t0:.1f}s alive={int(m['n_alive'])}",
          file=sys.stderr)
    state = trainer.state
    save_checkpoint(state, 300, CKPT)

cam = cams[0]
gt = gt_images[0]
N = state.capacity
demand = int(entry_demand_probe(state, *cam, width=W, height=H, tile=TILE))
BUDGET = args.budget or pick_entry_budget(demand)
print(f"capacity={N} alive={int(state.num_alive)} demand={demand} "
      f"budget={BUDGET}", file=sys.stderr)

TX, TY = num_tiles(W, H, TILE)
T_TOTAL = TX * TY


def bench(name, fn, *a, reps=args.reps):
    jfn = jax.jit(fn)
    out = jfn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*a)
    jax.block_until_ready(out)
    print(f"{name:48s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


def proj(state):
    return project_gaussians(
        state.params.means, state.scales(), state.params.quats,
        state.opacity(), *cam, W, H, sh=state.sh(), sh_degree=SH)


def upto_alloc(state):
    sp = proj(state)
    keys, payload, order, seg_end, total, alive = PR._alloc_entries(
        pack_splats(sp), sp, W, H, TILE, BUDGET)
    return keys, payload, order, seg_end, total, alive


def upto_sort(state):
    keys, payload = upto_alloc(state)[:2]
    return jax.lax.sort(keys + payload, num_keys=len(keys),
                        is_stable=False)


def upto_stream(state):
    sp = proj(state)
    keys, payload = PR._alloc_entries(
        pack_splats(sp), sp, W, H, TILE, BUDGET)[:2]
    return PR._sorted_stream(keys, payload, T_TOTAL, 3)[:3]


def upto_fwd(state):
    sp = proj(state)
    return PR.rasterize_pallas(sp, W, H, tile=TILE,
                               entry_budget=BUDGET).color


def loss_fwd(params, state):
    import dataclasses
    s = dataclasses.replace(state, params=params)
    sp = project_gaussians(
        params.means, s.scales(), params.quats, s.opacity(), *cam, W, H,
        sh=s.sh(), sh_degree=SH)
    out = PR.rasterize_pallas(sp, W, H, tile=TILE, entry_budget=BUDGET)
    return 0.8 * l1_loss(out.color, gt) + 0.2 * (1.0 - ssim(out.color, gt))


def full_grad(state):
    return jax.grad(loss_fwd)(state.params, state)


def loss_l1_only(params, state):
    import dataclasses
    s = dataclasses.replace(state, params=params)
    sp = project_gaussians(
        params.means, s.scales(), params.quats, s.opacity(), *cam, W, H,
        sh=s.sh(), sh_degree=SH)
    out = PR.rasterize_pallas(sp, W, H, tile=TILE, entry_budget=BUDGET)
    return l1_loss(out.color, gt)


_, *_, total_d, alive_d = jax.jit(upto_alloc)(state)
print(f"alloc: total={int(total_d)} alive_after_cull={int(alive_d)} "
      f"({100.0 * int(alive_d) / max(1, int(total_d)):.0f}% survive)",
      file=sys.stderr)

def alloc_n_scale(state):
    """N-scale prefix of _alloc_entries: argsort + premeta + cumsum."""
    sp = proj(state)
    packed = pack_splats(sp)
    from wheat3dgs_tpu.ops.binning import capped_rect, num_tiles as _nt
    tx, ty = _nt(W, H, TILE)
    rx, ry, sx, _, count = capped_rect(sp, tx, ty, TILE, 1024)
    q_max = 2.0 * jnp.log(jnp.maximum(sp.opacity, 1e-12) * 255.0)
    premeta = jnp.concatenate([
        packed[:, :7], packed[:, 8:11],
        count.astype(jnp.float32)[:, None],
        jnp.maximum(sx, 1).astype(jnp.float32)[:, None],
        (ry * tx + rx).astype(jnp.float32)[:, None],
        q_max[:, None]], axis=1)
    order = jnp.argsort(sp.depth, stable=True)
    premeta_r = premeta[order]
    count_r = premeta_r[:, 10].astype(jnp.int32)
    offs_r = jnp.cumsum(count_r) - count_r
    return premeta_r, offs_r, count_r


def alloc_owner(state):
    premeta_r, offs_r, count_r = alloc_n_scale(state)
    n = offs_r.shape[0]
    scat = jnp.where(count_r > 0, offs_r, BUDGET)
    mark = jnp.zeros((BUDGET,), jnp.int32).at[scat].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    owner = jax.lax.cummax(mark)
    return premeta_r, owner


def alloc_mrow(state):
    premeta_r, owner = alloc_owner(state)
    return premeta_r[owner]


bench("A projection", proj, state)
bench("B1 +N-scale alloc (argsort/premeta/cumsum)", alloc_n_scale, state)
bench("B2 +ownership (scatter-max+cummax)", alloc_owner, state)
bench("B3 +mrow gather (E,16)", alloc_mrow, state)
bench("B +alloc/cull keys", upto_alloc, state)
bench("C +phase-1 sort (key,slot)", upto_sort, state)
bench("D +payload gather (_sorted_stream)", upto_stream, state)
bench("E +fwd kernel (full render)", upto_fwd, state)
bench("F full loss fwd (L1+SSIM)", lambda s: loss_fwd(s.params, s), state)
bench("G full value_and_grad", full_grad, state)
bench("I grad L1-only (no SSIM)", lambda s: jax.grad(loss_l1_only)(
    s.params, s), state)


def full_step(state):
    """The ACTUAL train step (value_and_grad + Adam + densify stats +
    metrics) — the H-G delta is pure optimizer/stats/glue cost."""
    from wheat3dgs_tpu.training import _step_core
    w2c, fp, cc, tfx, tfy = cam
    st, m = _step_core(
        state, w2c[None], fp[None], cc[None], jnp.asarray(tfx)[None],
        jnp.asarray(tfy)[None], gt[None], jnp.zeros(3, jnp.float32),
        jnp.int32(1000), 1.0, sh_degree=SH, width=W, height=H, opt=opt,
        config=dataclasses.replace(trainer.config, entry_budget=BUDGET))
    return m, st   # return EVERYTHING so XLA cannot DCE any of the step


import dataclasses  # noqa: E402
bench("H full train_step (G + Adam + stats)", full_step, state)


# --- J/K: the bench-style scanned WINDOW (train_step_scan) --------------
# bench.py times WINDOW-sized scan blocks over rotating views; prof stage H
# times one fixed-view step. J-H therefore splits into scan-program
# overhead (K-H, same fixed view inside the scan) and per-view cost
# variability (J-K, rotating views exactly like bench).
def _window(state, view_idx, n_steps):
    from wheat3dgs_tpu.training import train_step_scan
    stacks = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    w2c_s, fp_s, cc_s, tfx_s, tfy_s = stacks
    st, m = train_step_scan(
        state, w2c_s, fp_s, cc_s, jnp.asarray(tfx_s), jnp.asarray(tfy_s),
        gt_images, view_idx, jnp.zeros(3, jnp.float32), jnp.int32(1000),
        n_steps=n_steps, sh_degree=SH, width=W, height=H, opt=opt,
        config=dataclasses.replace(trainer.config, entry_budget=BUDGET))
    return st, m


WIN = 20
rng_v = np.random.default_rng(1)
vi_rot = jnp.asarray(rng_v.integers(len(cams), size=WIN), jnp.int32)
vi_fix = jnp.zeros((WIN,), jnp.int32)


def bench_window(name, view_idx, reps=max(2, args.reps // 2)):
    jfn = jax.jit(functools.partial(_window, n_steps=WIN))
    out = jfn(state, view_idx)
    jax.block_until_ready(out[1]["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(state, view_idx)
    jax.block_until_ready(out[1]["loss"])
    per = (time.perf_counter() - t0) / reps / WIN * 1e3
    print(f"{name:48s} {per:8.2f} ms")


import functools  # noqa: E402
bench_window(f"K scan window x{WIN}, FIXED view (/step)", vi_fix)
bench_window(f"J scan window x{WIN}, rotating views (/step)", vi_rot)
