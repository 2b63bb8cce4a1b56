"""Sort cost scaling: operands x size, plus stack/broadcast pieces."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wheat3dgs_jax_cache_tpu")

rng = np.random.default_rng(0)


def bench(name, fn, *args, reps=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter() - t0) / reps * 1e3:8.2f} ms")
    return out


for E in (2_097_152, 4_194_304):
    key = jnp.asarray(rng.integers(0, 1 << 31, E), jnp.uint32)
    # realistic: 10% real keys, 90% sentinel-max keys
    keyr = jnp.asarray(
        np.where(rng.random(E) < 0.094,
                 rng.integers(0, 1 << 30, E),
                 (1900 << 21) + rng.integers(0, 1 << 21, E)), jnp.uint32)
    orig = jnp.arange(E, dtype=jnp.int32)
    cols = tuple(jnp.asarray(rng.standard_normal(E), jnp.float32)
                 for _ in range(16))
    lbl = f"E={E//1024//1024}M"
    bench(f"{lbl} sort 2-op (key,orig)",
          lambda k, o: jax.lax.sort((k, o), num_keys=1, is_stable=False),
          key, orig)
    bench(f"{lbl} sort 2-op sentinel-heavy",
          lambda k, o: jax.lax.sort((k, o), num_keys=1, is_stable=False),
          keyr, orig)
    bench(f"{lbl} sort 10-op",
          lambda k, o, *cs: jax.lax.sort((k, o) + cs, num_keys=1,
                                         is_stable=False),
          key, orig, *cols[:8])
    bench(f"{lbl} sort 18-op",
          lambda k, o, *cs: jax.lax.sort((k, o) + cs, num_keys=1,
                                         is_stable=False),
          key, orig, *cols)
    bench(f"{lbl} sort 18-op sentinel-heavy",
          lambda k, o, *cs: jax.lax.sort((k, o) + cs, num_keys=1,
                                         is_stable=False),
          keyr, orig, *cols)
    bench(f"{lbl} stack 16 cols",
          lambda *cs: jnp.stack(cs), *cols)
    stile = jnp.sort(jnp.asarray(rng.integers(0, 1901, E), jnp.int32))
    bench(f"{lbl} searchsorted x2",
          lambda s: (jnp.searchsorted(s, jnp.arange(1900, dtype=jnp.int32),
                                      side="left"),
                     jnp.searchsorted(s, jnp.arange(1900, dtype=jnp.int32),
                                      side="right")), stile)

# broadcast expansion N -> (N,16).ravel()
N = 262_144
col = jnp.asarray(rng.standard_normal(N), jnp.float32)
bench("broadcast 16 cols N->(N,16).ravel",
      lambda c: tuple(jnp.broadcast_to(c[:, None], (N, 16)).ravel()
                      for _ in range(16)), col)
