"""Microbench of binning-sort strategies on the attached TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

E = 2_097_152          # = 131072 * 16 entries
N = 131_072
T = 1900

rng = np.random.default_rng(0)
tile_id = jnp.asarray(rng.integers(0, T + 1, E), jnp.int32)
rank = jnp.asarray(rng.permutation(E) % N, jnp.int32)
gauss = jnp.asarray(rng.integers(0, N, E), jnp.int32)
orig = jnp.arange(E, dtype=jnp.int32)
key_packed = (tile_id.astype(jnp.uint32) << 20) | rank.astype(jnp.uint32)
payload = (gauss.astype(jnp.uint32) << 4) | (orig.astype(jnp.uint32) & 15)


def bench(name, fn, *args, reps=10):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")


bench("4-array 2-key sort (current)",
      lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=2,
                                      is_stable=False),
      tile_id, rank, gauss, orig)
bench("2-array 1-key packed sort",
      lambda k, p: jax.lax.sort((k, p), num_keys=1, is_stable=False),
      key_packed, payload)
bench("1-array packed key sort",
      lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False), key_packed)
bench("1-array int32 sort",
      lambda k: jax.lax.sort((k.astype(jnp.int32),), num_keys=1,
                             is_stable=False), key_packed >> 1)
bench("1-array f32 bitcast sort",
      lambda k: jax.lax.sort(
          (jax.lax.bitcast_convert_type((k >> 1).astype(jnp.int32),
                                        jnp.float32),),
          num_keys=1, is_stable=False), key_packed)

# E/2 and E/4 scaling
for div in (2, 4):
    bench(f"1-array packed sort E/{div}",
          lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False),
          key_packed[: E // div])

# N-sized depth argsort (already in pipeline)
depth = jnp.asarray(rng.random(N), jnp.float32)
bench("argsort N depth (current prologue)",
      lambda d: jnp.argsort(d, stable=True), depth)
bench("sort N (unstable, 2arr)",
      lambda d, i: jax.lax.sort((d, i), num_keys=1, is_stable=False),
      depth, jnp.arange(N, dtype=jnp.int32))

# permutation scatter E -> E_pad
E_pad = E + 127 * T
target = jnp.asarray(rng.permutation(E_pad)[:E], jnp.int32)
bench("permutation scatter set (E->E_pad)",
      lambda t, g: jnp.full((E_pad,), -1, jnp.int32).at[t].set(
          g, mode="drop"), target, gauss)

# searchsorted T in E
stile = jnp.sort(tile_id)
bench("searchsorted x2 (starts/ends)",
      lambda s: (jnp.searchsorted(s, jnp.arange(T, dtype=jnp.int32), "left"),
                 jnp.searchsorted(s, jnp.arange(T, dtype=jnp.int32), "right")),
      stile)

# row gather (E_pad, 16) from (N, 16)
packed = jnp.asarray(rng.random((N, 16)), jnp.float32)
idx = jnp.asarray(rng.integers(0, N, E_pad), jnp.int32)
bench("row gather (E_pad,16)", lambda p, i: p[i], packed, idx)
bench("row gather+mask+T (current entry path)",
      lambda p, i: jnp.where((i >= 0)[:, None], p[jnp.maximum(i, 0)], 0.0).T,
      packed, idx)
# gather from depth-sorted packed by rank only (payload-free variant)
bench("row gather by rank (E_pad,16)", lambda p, i: p[i % N], packed, idx)
bench("transpose (E_pad,16)->(16,E_pad)", lambda p: p[idx].T, packed)

# scatter-add histogram (count_tiles core)
bench("scatter-add histogram E->T",
      lambda t: jnp.zeros((T + 1,), jnp.int32).at[t].add(1), tile_id)

# inv_map style gather: (N, 16, 16) rows from (E_pad, 16)
dent = jnp.asarray(rng.random((E_pad, 16)), jnp.float32)
inv = jnp.asarray(rng.integers(0, E_pad, (N, 16)), jnp.int32)
bench("bwd inv_map gather (N,16,16)+sum",
      lambda d, i: d[i].sum(axis=1), dent, inv)
