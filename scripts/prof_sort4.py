"""Round 2 isolation: where do D1's 41ms go, scatter hints, and
sort-as-reduction costs for the backward."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

N = 131_072
MTPG = 16
T_TOTAL = 1900
E = N * MTPG
CHUNK = 128
E_PAD = E + (CHUNK - 1) * T_TOTAL
RB = 21

rng = np.random.default_rng(0)
# realistic sorted stream: ~60% real entries spread over tiles, rest sentinel
tile_of = np.sort(rng.integers(0, T_TOTAL, int(E * 0.59)))
stile = np.full((E,), T_TOTAL, np.int32)
stile[: tile_of.size] = tile_of
skey = (stile.astype(np.uint32) << RB) | rng.integers(
    0, N, E).astype(np.uint32)
sorig = rng.permutation(E).astype(np.int32)
skey_j = jnp.asarray(skey)
sorig_j = jnp.asarray(sorig)
stile_j = jnp.asarray(stile)

starts_np = np.searchsorted(stile, np.arange(T_TOTAL), side="left")
ends_np = np.searchsorted(stile, np.arange(T_TOTAL), side="right")
counts_np = (ends_np - starts_np).astype(np.int32)
starts_j = jnp.asarray(starts_np.astype(np.int32))
counts_j = jnp.asarray(counts_np)


def bench(name, fn, *args, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:58s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


# ---- D-breakdown ----
def target_math(stile, starts, counts):
    chunk_rows = -(-counts // CHUNK) * CHUNK
    padded_starts = (jnp.cumsum(chunk_rows) - chunk_rows).astype(jnp.int32)
    st = jnp.minimum(stile, T_TOTAL - 1)
    pos = jnp.arange(E, dtype=jnp.int32) - starts[st]
    return jnp.where(stile < T_TOTAL, padded_starts[st] + pos, E_PAD)

target = bench("D.a target math only (two small-table gathers)",
               target_math, stile_j, starts_j, counts_j)

gauss = sorig_j // MTPG

def scat_plain(target, gauss):
    return jnp.full((E_PAD,), -1, jnp.int32).at[target].set(
        gauss, mode="drop")

bench("D.b scatter precomputed (plain)", scat_plain, target, gauss)

def scat_hinted(target, gauss):
    return jnp.full((E_PAD,), -1, jnp.int32).at[target].set(
        gauss, mode="drop", indices_are_sorted=True, unique_indices=True)

o1 = bench("D.c scatter precomputed (sorted+unique hints)", scat_hinted,
           target, gauss)
o0 = jax.jit(scat_plain)(target, gauss)
print("   hinted == plain:", bool((o0 == o1).all()))

def e_gather_small(stile, starts):
    return starts[jnp.minimum(stile, T_TOTAL - 1)]

bench("D.d E-gather from (T,) table", e_gather_small, stile_j, starts_j)

# inv scatter with unique hint (it's a permutation)
def inv_plain(target, sorig):
    return jnp.full((E,), E_PAD, jnp.int32).at[sorig].set(target)

bench("E.a inv_map scatter plain", inv_plain, target, sorig_j)

def inv_hint(target, sorig):
    return jnp.full((E,), E_PAD, jnp.int32).at[sorig].set(
        target, unique_indices=True)

bench("E.b inv_map scatter unique hint", inv_hint, target, sorig_j)

# ---- sort-as-reduction for the backward ----
dent16 = jnp.asarray(rng.standard_normal((16, E), np.float32))
cols = tuple(dent16[i] for i in range(16))
rankkey = (skey_j & ((1 << RB) - 1)).astype(jnp.int32)

def sort17(rk, *cols):
    out = jax.lax.sort((rk,) + cols, num_keys=1, is_stable=False)
    return out[1]

bench("S.17-operand sort (rank + 16 f32)", sort17, rankkey, *cols)

def sort9(rk, *cols8):
    out = jax.lax.sort((rk,) + cols8, num_keys=1, is_stable=False)
    return out[1]

bench("S.9-operand sort (rank + 8 f32)", sort9, rankkey, *cols[:8])

def sort5(rk, *cols4):
    out = jax.lax.sort((rk,) + cols4, num_keys=1, is_stable=False)
    return out[1]

bench("S.5-operand sort (rank + 4 f32)", sort5, rankkey, *cols[:4])

def sort_bf16pack(rk, *cols):
    packed = []
    for i in range(0, 16, 2):
        a = cols[i].astype(jnp.bfloat16)
        b = cols[i + 1].astype(jnp.bfloat16)
        w = (jax.lax.bitcast_convert_type(a, jnp.uint16).astype(jnp.uint32)
             | (jax.lax.bitcast_convert_type(b, jnp.uint16).astype(jnp.uint32)
                << 16))
        packed.append(w)
    out = jax.lax.sort((rk,) + tuple(packed), num_keys=1, is_stable=False)
    return out[1]

bench("S.bf16-packed 9-operand sort", sort_bf16pack, rankkey, *cols)

# full bwd reduction via sort: sort by sorig (groups gaussians, exactly MTPG
# rows each), reshape-sum, vs the inv_map gather
def red_sort(sorig, *cols):
    out = jax.lax.sort((sorig,) + cols, num_keys=1, is_stable=False)
    stacked = jnp.stack(out[1:], axis=-1)          # (E, 16)
    return stacked.reshape(N, MTPG, 16).sum(axis=1)

bench("S.full bwd reduction via 17-op sort+reshape", red_sort, sorig_j, *cols)
