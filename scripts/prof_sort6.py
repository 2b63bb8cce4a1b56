"""Sort scaling with CHAINED reps (each rep consumes the previous rep's
output) so no layer can elide repeated identical dispatches."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

rng = np.random.default_rng(0)


def bench_chain(name, jfn, state, reps=10):
    """jfn: state -> state (jitted). Chained timing."""
    state = jfn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = jfn(state)
    jax.block_until_ready(state)
    print(f"{name:56s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")


for E in (2_097_152, 4_194_304):
    key0 = jnp.asarray(rng.integers(0, 1 << 31, E), jnp.uint32)
    orig0 = jnp.arange(E, dtype=jnp.int32)
    cols0 = tuple(jnp.asarray(rng.standard_normal(E), jnp.float32)
                  for _ in range(16))
    lbl = f"E={E//1024//1024}M"

    @jax.jit
    def s2(st):
        k, o = st
        sk, so = jax.lax.sort((k, o), num_keys=1, is_stable=False)
        return (sk ^ so.astype(jnp.uint32), so)  # perturb key each rep

    bench_chain(f"{lbl} chained sort 2-op", s2, (key0, orig0))

    @jax.jit
    def s18(st):
        k, o, cols = st
        out = jax.lax.sort((k, o) + cols, num_keys=1, is_stable=False)
        return (out[0] ^ out[1].astype(jnp.uint32), out[1], out[2:])

    bench_chain(f"{lbl} chained sort 18-op", s18, (key0, orig0, cols0))

    @jax.jit
    def gat(st):
        idx, table = st
        rows = table[idx]                       # (E, 16) random row gather
        return ((idx + 1) % table.shape[0], table + rows[:1])

    N = 262_144
    table = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, E), jnp.int32)
    bench_chain(f"{lbl} chained row gather from (262k,16)", gat, (idx, table))
