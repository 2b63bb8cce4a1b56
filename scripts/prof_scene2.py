"""Decompose _sorted_stream cost in-context on the real bench scene.
Caches the burned-in state so reruns skip the 300-iter burn-in."""
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
from wheat3dgs_tpu.models.serialization import load_checkpoint, save_checkpoint
from wheat3dgs_tpu.ops import pallas_raster as PR
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.render.pipeline import RasterConfig, inference_config
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer

SCENE = os.environ.get("WHEAT3DGS_BENCH_SCENE", "/tmp/wheat3dgs_bench_scene_100k")
CKPT = "/tmp/prof_burnin_state.npz"
W, H, SH, MTPG, TILE = 1600, 1200, 3, 16, 32

model = ModelParams(source_path=SCENE, model_path="", eval=True, resolution=1)
scene = Scene(model, sh_degree=SH, shuffle=False)
w, h = scene.image_size
config = inference_config(RasterConfig(max_tiles_per_gauss=MTPG,
                                       max_per_tile=512, tile_batch=128))
opt = OptimizationParams(iterations=310, densify_from_iter=20,
                         densify_until_iter=250, densification_interval=40,
                         opacity_reset_interval=100_000)
trainer = Trainer(scene.gaussians, opt, scene.cameras_extent, sh_degree=SH,
                  config=config)
trainer.active_sh_degree = SH
gt_images = jnp.asarray(scene.data.train.images)
cams = [scene.cam_arrays("train", i) for i in range(gt_images.shape[0])]

if os.path.exists(CKPT):
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


def bench(name, fn, *args, reps=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


def proj(state):
    return project_gaussians(
        state.params.means, state.scales(), state.params.quats,
        state.opacity(), *cam, W, H, sh=state.sh(), sh_degree=SH)

splats = bench("A projection", proj, state)

from wheat3dgs_tpu.ops.binning import num_tiles
from wheat3dgs_tpu.ops.raster import pack_splats

TX, TY = num_tiles(W, H, TILE)
T_TOTAL = TX * TY
RB = PR._rank_bits(T_TOTAL)


def upto_keys(state):
    sp = proj(state)
    return PR._expand_keys(sp, W, H, TILE, MTPG)

keys = bench("B +expand keys", upto_keys, state)


def upto_sort2(state):
    (key,) = upto_keys(state)
    e = key.shape[0]
    orig = jnp.arange(e, dtype=jnp.int32)
    return jax.lax.sort((key, orig), num_keys=1, is_stable=False)

bench("C +sort 2-op (no payload)", upto_sort2, state)


def upto_sort18(state):
    sp = proj(state)
    (key,) = PR._expand_keys(sp, W, H, TILE, MTPG)
    packed = pack_splats(sp)
    n = packed.shape[0]
    e = n * MTPG
    orig = jnp.arange(e, dtype=jnp.int32)
    cols = tuple(jnp.broadcast_to(packed[:, f][:, None], (n, MTPG)).ravel()
                 for f in range(11))
    return jax.lax.sort((key, orig) + cols, num_keys=1, is_stable=False)

bench("D +sort 13-op (key+orig+11 cols)", upto_sort18, state)


def upto_sort18_mat(state):
    sp = proj(state)
    (key,) = PR._expand_keys(sp, W, H, TILE, MTPG)
    packed = pack_splats(sp)
    n = packed.shape[0]
    e = n * MTPG
    orig = jnp.arange(e, dtype=jnp.int32)
    cols = tuple(
        jax.lax.optimization_barrier(
            jnp.broadcast_to(packed[:, f][:, None], (n, MTPG)).ravel() + 0.0)
        for f in range(11))
    key = jax.lax.optimization_barrier(key)
    return jax.lax.sort((key, orig) + cols, num_keys=1, is_stable=False)

bench("E same w/ materialized operands", upto_sort18_mat, state)


def full_stream(state):
    sp = proj(state)
    keys = PR._expand_keys(sp, W, H, TILE, MTPG)
    return PR._sorted_stream(pack_splats(sp), keys, T_TOTAL, MTPG, 3)

bench("F full _sorted_stream", full_stream, state)


def stream_no_bounds(state):
    sp = proj(state)
    keys = PR._expand_keys(sp, W, H, TILE, MTPG)
    packed = pack_splats(sp)
    n = packed.shape[0]
    e = n * MTPG
    orig = jnp.arange(e, dtype=jnp.int32)
    cols = tuple(jnp.broadcast_to(packed[:, f][:, None], (n, MTPG)).ravel()
                 for f in range(11))
    out = jax.lax.sort((keys[0], orig) + cols, num_keys=1, is_stable=False)
    lane = jnp.stack(out[2:] + (jnp.zeros((e,), jnp.float32),) * 5)
    return lane, out[0], out[1]

bench("G sort+stack (no searchsorted)", stream_no_bounds, state)
