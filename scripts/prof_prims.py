"""Primitive cost measurements for the entry-stream redesign (round 3).

Times, on the real TPU: lax.sort at several sizes/operand counts,
scatter-max allocation, cummax, gathers, sorted segment-sum — the building
blocks of (a) two-tier expansion vs (b) exact-entry allocation.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

N = 131072
key = jax.random.PRNGKey(0)


def bench(name, fn, *a, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*a)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


for E in (786432, 1048576, 1572864, 4194304):
    ks = jax.random.randint(key, (E,), 0, 1 << 30, dtype=jnp.int32
                            ).astype(jnp.uint32)
    orig = jnp.arange(E, dtype=jnp.int32)
    pay = [jax.random.randint(key, (E,), 0, 1 << 30, dtype=jnp.int32
                              ).astype(jnp.uint32) for _ in range(5)]
    bench(f"sort E={E} 2-op", lambda k, o: jax.lax.sort(
        (k, o), num_keys=1, is_stable=False), ks, orig)
    bench(f"sort E={E} 6-op", lambda k, *p: jax.lax.sort(
        (k,) + p, num_keys=1, is_stable=False), ks, *pay)

E = 786432
counts = jax.random.randint(key, (N,), 0, 9, dtype=jnp.int32)
offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])
vals = jax.random.normal(key, (E,), jnp.float32)
idx_small = jax.random.randint(key, (N,), 0, E, dtype=jnp.int32)


def alloc(counts):
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(counts)[:-1]])
    mark = jnp.zeros((E,), jnp.int32).at[offs].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop")
    return jax.lax.associative_scan(jnp.maximum, mark)


owner = bench("alloc: cumsum+scatter-max(N)+cummax(E=786k)", alloc, counts)

tbl = jax.random.randint(key, (N,), 0, 1 << 20, dtype=jnp.int32)
bench("gather int32 (E=786k idx from N tbl)", lambda o, t: t[o], owner, tbl)
bench("gather 4x int32 (E idx)", lambda o, t: (t[o], (t + 1)[o], (t + 2)[o],
                                               (t + 3)[o]), owner, tbl)
packed = jax.random.normal(key, (N, 16), jnp.float32)
bench("gather packed (E,16) f32", lambda o, p: p[o], owner, packed)

sorted_ids = jnp.sort(jax.random.randint(key, (E,), 0, N, dtype=jnp.int32))
data10 = jax.random.normal(key, (E, 10), jnp.float32)


def segsum(ids, d):
    return jax.ops.segment_sum(d, ids, num_segments=N,
                               indices_are_sorted=True)


bench("segment_sum sorted (E=786k,10)->N", segsum, sorted_ids, data10)


def segsum_cumsum(ids, d, offs, counts):
    c = jnp.cumsum(d, axis=0)
    ends = jnp.clip(offs + counts - 1, 0, E - 1)
    tot = jnp.where((counts > 0)[:, None], c[ends], 0.0)
    prev = jnp.where((offs > 0) & (counts > 0),
                     offs - 1, 0)
    base = jnp.where(((offs > 0) & (counts > 0))[:, None], c[prev], 0.0)
    return tot - base


bench("segsum via cumsum(E,10)+2 gathers(N)", segsum_cumsum, sorted_ids,
      data10, offs, counts)

# two-tier merge cost: concat two sorted streams + merge sort
a = jnp.sort(jax.random.randint(key, (1048576,), 0, 1 << 30, jnp.int32))
b = jnp.sort(jax.random.randint(key, (524288,), 0, 1 << 30, jnp.int32))
bench("sort concat(1M+512k) 2-op (tier merge)",
      lambda a, b: jax.lax.sort(
          (jnp.concatenate([a, b]),
           jnp.arange(a.shape[0] + b.shape[0], dtype=jnp.int32)),
          num_keys=1, is_stable=False), a, b)
