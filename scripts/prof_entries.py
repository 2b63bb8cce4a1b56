"""Sub-stage timing of the new _sorted_entries on real splats."""
import os
import sys
import time
import math

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

from wheat3dgs_tpu.testing import random_gaussians, look_at_camera
from wheat3dgs_tpu.models import gaussians as G
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.ops.binning import capped_rect, num_tiles

W, H, SH, MTPG, TILE = 1600, 1200, 3, 16, 32
N = 131_072
CHUNK = 128

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
splats = jax.jit(lambda s: project_gaussians(
    s.params.means, s.scales(), s.params.quats, s.opacity(), *cams, W, H,
    sh=s.sh(), sh_degree=SH))(state)
jax.block_until_ready(splats)

tiles_x, tiles_y = num_tiles(W, H, TILE)
T_TOTAL = tiles_x * tiles_y
E = N * MTPG
E_PAD = E + (CHUNK - 1) * T_TOTAL
TILE_BITS = max(1, math.ceil(math.log2(T_TOTAL + 1)))
RB = 32 - TILE_BITS


def bench(name, fn, *args, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


def upto_expand(sp):
    n = sp.xy.shape[0]
    rx, ry, sx, sy, count = capped_rect(sp, tiles_x, tiles_y, TILE, MTPG)
    depth_order = jnp.argsort(sp.depth, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    slots = jnp.arange(MTPG, dtype=jnp.int32)
    ssx = jnp.maximum(sx, 1)
    recip = 1.0 / ssx.astype(jnp.float32)
    off_y = jnp.floor(slots[None, :].astype(jnp.float32)
                      * recip[:, None]).astype(jnp.int32)
    off_x = slots[None, :] - off_y * ssx[:, None]
    tid = ((ry[:, None] + off_y) * tiles_x + (rx[:, None] + off_x)).astype(
        jnp.int32)
    valid = slots[None, :] < count[:, None]
    tid = jnp.where(valid, tid, T_TOTAL)
    return tid, rank

bench("1 expand (rect + rank + tile ids)", upto_expand, splats)


def upto_sort(sp):
    tid, rank = upto_expand(sp)
    key = ((tid.astype(jnp.uint32) << RB)
           | rank.astype(jnp.uint32)[:, None]).ravel()
    skey, sorig = jax.lax.sort(
        (key, jnp.arange(E, dtype=jnp.int32)), num_keys=1, is_stable=False)
    return skey, sorig

skey, sorig = bench("2 + packed sort", upto_sort, splats)


def upto_bounds(sp):
    skey, sorig = upto_sort(sp)
    stile = (skey >> RB).astype(jnp.int32)
    tids = jnp.arange(T_TOTAL, dtype=jnp.int32)
    starts = jnp.searchsorted(stile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(stile, tids, side="right").astype(jnp.int32)
    return starts, ends - starts, stile, sorig

bench("3 + searchsorted bounds", upto_bounds, splats)


def upto_target(sp):
    starts, counts, stile, sorig = upto_bounds(sp)
    chunk_rows = -(-counts // CHUNK) * CHUNK
    padded_starts = (jnp.cumsum(chunk_rows) - chunk_rows).astype(jnp.int32)
    st = jnp.minimum(stile, T_TOTAL - 1)
    pos = jnp.arange(E, dtype=jnp.int32) - starts[st]
    target = jnp.where(stile < T_TOTAL, padded_starts[st] + pos, E_PAD)
    return target, padded_starts, counts, sorig

bench("4 + target math", upto_target, splats)


def full(sp):
    target, padded_starts, counts, sorig = upto_target(sp)
    gauss = sorig // MTPG
    idx_table = jnp.full((E_PAD,), -1, jnp.int32).at[target].set(
        gauss, mode="drop", indices_are_sorted=True, unique_indices=True)
    return idx_table, padded_starts, counts, target, sorig

bench("5 + idx scatter (full)", full, splats)

# searchsorted method variants
stile = (skey >> RB).astype(jnp.int32)
tids = jnp.arange(T_TOTAL, dtype=jnp.int32)
for method in ("scan", "scan_unrolled", "sort", "compare_all"):
    try:
        bench(f"searchsorted x2 method={method}",
              lambda s, t, m=method: (
                  jnp.searchsorted(s, t, side="left", method=m),
                  jnp.searchsorted(s, t, side="right", method=m)),
              stile, tids)
    except Exception as exc:
        print(f"searchsorted {method}: {type(exc).__name__}")
