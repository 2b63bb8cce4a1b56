"""Follow-up: clean pre-jitted microbenches + _sorted_entries breakdown."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

E = 2_097_152
N = 131_072
T = 1900
E_pad = E + 127 * T

rng = np.random.default_rng(0)
tile_id = jnp.asarray(rng.integers(0, T + 1, E), jnp.int32)
rank = jnp.asarray(rng.permutation(E) % N, jnp.int32)
gauss = jnp.asarray(rng.integers(0, N, E), jnp.int32)
orig = jnp.arange(E, dtype=jnp.int32)
dent = jnp.asarray(rng.random((E_pad, 16)), jnp.float32)
inv = jnp.asarray(rng.integers(0, E_pad, (N, 16)), jnp.int32)
lane = jnp.asarray(rng.random((16, E_pad)), jnp.float32)


def bench(name, fn, *args, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:52s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")


bench("4-array 2-key sort", lambda a, b, c, d: jax.lax.sort(
    (a, b, c, d), num_keys=2, is_stable=False), tile_id, rank, gauss, orig)

bench("bwd gather (N,16) idx -> (N,16,16) + sum",
      lambda d, i: d[i].sum(axis=1), dent, inv)
bench("bwd gather flat idx -> (N*16,16) reshape + sum",
      lambda d, i: d[i.reshape(-1)].reshape(N, 16, 16).sum(axis=1), dent, inv)
bench("bwd gather flat via take",
      lambda d, i: jnp.take(d, i.reshape(-1), axis=0).reshape(
          N, 16, 16).sum(axis=1), dent, inv)
bench("transpose (16,E_pad)->(E_pad,16)", lambda x: x.T, lane)
bench("transpose then flat gather+sum",
      lambda x, i: x.T[i.reshape(-1)].reshape(N, 16, 16).sum(axis=1),
      lane, inv)
bench("gather cols (16,E_pad) by flat idx -> sum",
      lambda x, i: x[:, i.reshape(-1)].reshape(16, N, 16).sum(axis=2).T,
      lane, inv)

# scatter-add histogram variants
bench("scatter-add hist E->T (int32)",
      lambda t: jnp.zeros((T + 1,), jnp.int32).at[t].add(1), tile_id)
bench("scatter-add hist E->T (f32)",
      lambda t: jnp.zeros((T + 1,), jnp.float32).at[t].add(1.0), tile_id)
bench("hist via sort+searchsorted",
      lambda t: jnp.diff(jnp.searchsorted(
          jax.lax.sort((t,), num_keys=1, is_stable=False)[0],
          jnp.arange(T + 2, dtype=jnp.int32))), tile_id)

# _sorted_entries full + internals on realistic splats
from wheat3dgs_tpu.testing import random_gaussians, look_at_camera
from wheat3dgs_tpu.models import gaussians as G
from wheat3dgs_tpu.ops.projection import project_gaussians
from wheat3dgs_tpu.ops import pallas_raster as PR
from wheat3dgs_tpu.ops.binning import capped_rect, num_tiles

W, H, SH, MTPG, TILE = 1600, 1200, 3, 16, 32
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

bench("_sorted_entries FULL",
      lambda sp: PR._sorted_entries(sp, W, H, TILE, MTPG), splats)

tiles_x, tiles_y = num_tiles(W, H, TILE)
t_total = tiles_x * tiles_y

def upto_sort(sp):
    n = sp.xy.shape[0]
    rx, ry, sx, sy, count = capped_rect(sp, tiles_x, tiles_y, TILE, MTPG)
    depth_order = jnp.argsort(sp.depth, stable=True)
    rk = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32))
    slots = jnp.arange(MTPG, dtype=jnp.int32)
    ssx = jnp.maximum(sx, 1)
    off_x = slots[None, :] % ssx[:, None]
    off_y = slots[None, :] // ssx[:, None]
    tid = ((ry[:, None] + off_y) * tiles_x + (rx[:, None] + off_x)).astype(
        jnp.int32)
    valid = slots[None, :] < count[:, None]
    tid = jnp.where(valid, tid, t_total)
    gi = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, MTPG))
    rks = jnp.broadcast_to(rk[:, None], (n, MTPG))
    e = n * MTPG
    op = jnp.arange(e, dtype=jnp.int32)
    return jax.lax.sort((tid.ravel(), rks.ravel(), gi.ravel(), op),
                        num_keys=2, is_stable=False)

bench("_sorted_entries: through lax.sort", upto_sort, splats)

def upto_searchsorted(sp):
    st, _, sg, so = upto_sort(sp)
    tids = jnp.arange(t_total, dtype=st.dtype)
    starts = jnp.searchsorted(st, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(st, tids, side="right").astype(jnp.int32)
    return starts, ends, st, sg, so

bench("_sorted_entries: + searchsorted", upto_searchsorted, splats)

def full_rest(sp):
    starts, ends, st, sg, so = upto_searchsorted(sp)
    counts = ends - starts
    e = N * MTPG
    e_pad2 = e + (128 - 1) * t_total
    chunk_rows = -(-counts // 128) * 128
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunk_rows)[:-1]])
    pos = jnp.arange(e, dtype=jnp.int32) - starts[
        jnp.minimum(st, t_total - 1)]
    target = jnp.where(st < t_total,
                       padded_starts[jnp.minimum(st, t_total - 1)] + pos,
                       e_pad2)
    idx_table = jnp.full((e_pad2,), -1, jnp.int32).at[target].set(
        sg, mode="drop")
    invm = jnp.full((e,), e_pad2, jnp.int32).at[so].set(
        jnp.where(st < t_total, target, e_pad2))
    return idx_table, invm

bench("_sorted_entries: + scatters (full)", full_rest, splats)
