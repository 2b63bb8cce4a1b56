"""Isolate the 49ms tail of _sorted_entries: pos/target math vs scatters,
plus candidate replacements (packed 1-key sort, gather-based idx_table,
float expansion math)."""
import os
import sys
import time

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


def bench(name, fn, *args, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


# ---- stage A: expansion math (int div/mod by variable span) ----
def expand_int(sp):
    rx, ry, sx, sy, count = capped_rect(sp, tiles_x, tiles_y, TILE, MTPG)
    slots = jnp.arange(MTPG, dtype=jnp.int32)
    ssx = jnp.maximum(sx, 1)
    off_x = slots[None, :] % ssx[:, None]
    off_y = slots[None, :] // ssx[:, None]
    tid = ((ry[:, None] + off_y) * tiles_x + (rx[:, None] + off_x)).astype(
        jnp.int32)
    valid = slots[None, :] < count[:, None]
    return jnp.where(valid, tid, T_TOTAL)

bench("A1 expansion tile_id (int div/mod)", expand_int, splats)


def expand_float(sp):
    rx, ry, sx, sy, count = capped_rect(sp, tiles_x, tiles_y, TILE, MTPG)
    slots = jnp.arange(MTPG, dtype=jnp.int32)
    ssx = jnp.maximum(sx, 1)
    recip = 1.0 / ssx.astype(jnp.float32)
    off_y = jnp.floor(slots[None, :].astype(jnp.float32)
                      * recip[:, None]).astype(jnp.int32)
    off_x = slots[None, :] - off_y * ssx[:, None]
    tid = ((ry[:, None] + off_y) * tiles_x + (rx[:, None] + off_x)).astype(
        jnp.int32)
    valid = slots[None, :] < count[:, None]
    return jnp.where(valid, tid, T_TOTAL)

bench("A2 expansion tile_id (float recip)", expand_float, splats)

# ---- stage B: sorts ----
def sort_current(sp):
    n = sp.xy.shape[0]
    tid = expand_int(sp)
    depth_order = jnp.argsort(sp.depth, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32))
    gi = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, MTPG))
    rks = jnp.broadcast_to(rank[:, None], (n, MTPG))
    op = jnp.arange(E, dtype=jnp.int32)
    return jax.lax.sort((tid.ravel(), rks.ravel(), gi.ravel(), op),
                        num_keys=2, is_stable=False)

bench("B1 current 4-arr 2-key sort chain", sort_current, splats)

RB = 21  # rank bits: N <= 2M; tile bits = 11 -> 32 total, use uint32

def sort_packed(sp):
    n = sp.xy.shape[0]
    tid = expand_float(sp)
    depth_order = jnp.argsort(sp.depth, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32))
    key = (tid.astype(jnp.uint32) << RB) | rank.astype(jnp.uint32)[:, None]
    op = jnp.arange(E, dtype=jnp.int32)
    return jax.lax.sort((key.ravel(), op), num_keys=1, is_stable=False)

skey, sorig = bench("B2 packed 1-key 2-arr sort chain", sort_packed, splats)

# ---- stage C: segment bounds ----
def bounds_from_packed(skey):
    stile = (skey >> RB).astype(jnp.int32)
    tids = jnp.arange(T_TOTAL, dtype=jnp.int32)
    starts = jnp.searchsorted(stile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(stile, tids, side="right").astype(jnp.int32)
    return starts, ends - starts

starts, counts = bench("C1 searchsorted bounds", bounds_from_packed, skey)


def bounds_via_hist(skey):
    stile = (skey >> RB).astype(jnp.int32)
    counts = jnp.zeros((T_TOTAL + 1,), jnp.int32).at[stile].add(
        1, mode="drop")[:T_TOTAL]
    starts = (jnp.cumsum(counts) - counts).astype(jnp.int32)
    return starts, counts

bench("C2 histogram bounds", bounds_via_hist, skey)

# ---- stage D: idx_table construction ----
def idx_scatter(skey, sorig, starts, counts):
    stile = (skey >> RB).astype(jnp.int32)
    chunk_rows = -(-counts // CHUNK) * CHUNK
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunk_rows)[:-1]])
    pos = jnp.arange(E, dtype=jnp.int32) - starts[
        jnp.minimum(stile, T_TOTAL - 1)]
    target = jnp.where(stile < T_TOTAL,
                       padded_starts[jnp.minimum(stile, T_TOTAL - 1)] + pos,
                       E_PAD)
    gauss = sorig // MTPG
    idx_table = jnp.full((E_PAD,), -1, jnp.int32).at[target].set(
        gauss, mode="drop")
    return idx_table, target, padded_starts

bench("D1 idx_table scatter (current)", idx_scatter, skey, sorig, starts,
      counts)


def idx_gather(skey, sorig, starts, counts):
    chunk_rows = -(-counts // CHUNK) * CHUNK
    padded_starts = (jnp.cumsum(chunk_rows) - chunk_rows).astype(jnp.int32)
    q = jnp.arange(E_PAD, dtype=jnp.int32)
    t_of_q = (jnp.searchsorted(padded_starts, q, side="right") - 1).astype(
        jnp.int32)
    t_of_q = jnp.clip(t_of_q, 0, T_TOTAL - 1)
    within = q - padded_starts[t_of_q]
    src = starts[t_of_q] + within
    ok = within < counts[t_of_q]
    idx_table = jnp.where(ok, sorig[jnp.minimum(src, E - 1)] // MTPG, -1)
    return idx_table, padded_starts

bench("D2 idx_table gather (searchsorted)", idx_gather, skey, sorig, starts,
      counts)

_, target, padded_starts = jax.jit(idx_scatter)(skey, sorig, starts, counts)
jax.block_until_ready(target)

# ---- stage E: inv_map ----
def inv_scatter(target, sorig):
    return jnp.full((E,), E_PAD, jnp.int32).at[sorig].set(target).reshape(
        N, MTPG)

bench("E1 inv_map scatter (current)", inv_scatter, target, sorig)

# ---- stage F: bwd reduction variants ----
rng = np.random.default_rng(1)
dent = jnp.asarray(rng.standard_normal((E_PAD, 16), np.float32))
inv = jax.jit(inv_scatter)(target, sorig)
jax.block_until_ready(inv)


def red_invmap(dent, inv):
    safe = jnp.minimum(inv, E_PAD - 1)
    rows = dent[safe]
    rows = jnp.where((inv < E_PAD)[..., None], rows, 0.0)
    return rows.sum(axis=1)

bench("F1 bwd reduction via inv_map gather (current)", red_invmap, dent, inv)


def red_sortfree(dent, target, sorig):
    # gather dent rows by (monotone-ish) target into sorted-entry order,
    # inverse-permute by scattering rows at sorig, reshape-reduce.
    rows = dent[jnp.minimum(target, E_PAD - 1)]
    rows = jnp.where((target < E_PAD)[:, None], rows, 0.0)
    exp = jnp.zeros((E, 16), jnp.float32).at[sorig].set(rows)
    return exp.reshape(N, MTPG, 16).sum(axis=1)

bench("F2 bwd reduction: target-gather + perm row scatter", red_sortfree,
      dent, target, sorig)

out1 = jax.jit(red_invmap)(dent, inv)
out2 = jax.jit(red_sortfree)(dent, target, sorig)
print("F1 vs F2 max abs diff:", float(jnp.abs(out1 - out2).max()))

# lane-major variants (dent as (16, E_PAD), as written by the kernel)
dent_lane = dent.T


def red_invmap_lane(dl, inv):
    safe = jnp.minimum(inv, E_PAD - 1)
    rows = dl.T[safe]
    rows = jnp.where((inv < E_PAD)[..., None], rows, 0.0)
    return rows.sum(axis=1)

bench("F3 F1 + lane-major transpose first", red_invmap_lane, dent_lane, inv)
