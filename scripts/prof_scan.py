"""Tri-matmul scan vs lane-axis cumsum inside a Pallas TPU kernel.

The fwd/bwd compositors spend most of their FLOPs on (P, C) @ triu(C, C)
prefix scans (cost P*C*C per chunk). jnp.cumsum along the lane axis would
be P*C*log C on the VPU — IF Mosaic supports it and lane shifts aren't
pathological. Timed as a chained fori_loop inside one jit (isolated
microbenches lie through the axon tunnel).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, C, STEPS = 1024, 128, 256


def make(kind):
    def kernel(x_ref, o_ref):
        r_ = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        c_ = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        tri = (r_ <= c_).astype(jnp.float32)
        def body(i, acc):
            if kind == "matmul":
                s = jnp.dot(acc, tri, preferred_element_type=jnp.float32)
            elif kind == "cumsum":
                s = jnp.cumsum(acc, axis=1)
            else:  # log-shift scan via roll
                s = acc
                k = 1
                while k < C:
                    r = pltpu.roll(s, k, 1)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (P, C), 1)
                    s = s + jnp.where(lane >= k, r, 0.0)
                    k *= 2
            # keep it live + bounded
            return s * (1.0 / jnp.maximum(1.0, jnp.max(jnp.abs(s))))

        o_ref[...] = jax.lax.fori_loop(0, STEPS, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((P, C), jnp.float32),
        )(x)

    return run


x = jnp.ones((P, C), jnp.float32) * 0.001
for kind in ("matmul", "cumsum", "roll"):
    try:
        run = make(kind)
        out = run(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / STEPS * 1e6
        print(f"{kind:8s} {dt:8.2f} us/scan ({P}x{C})")
    except Exception as e:
        print(f"{kind:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
