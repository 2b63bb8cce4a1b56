#!/usr/bin/env python
"""Measure TPU lane-padding cost of (N, small-C) parameter arrays.

TPU tiles the last two dims of every >=2D array to (8, 128); an (N, 3)
float32 array is physically (N_pad, 128) — 42x the logical bytes. The
Gaussian parameter pytree is built of exactly such arrays (means (N,3),
quats (N,4), scales (N,3), sh_dc (N,3), opacity (N,1)), and the Adam +
densify-stats tail reads/writes 4 copies of each per step.

Rows (jitted, donated where relevant, reps=20):
  A elementwise y = p * 1.0001 + 0.5 over the pytree as stored (N, C)
  B same arrays reshaped to 1-D (N*C,) before the op (dense layout)
  C same arrays TRANSPOSED to (C, N) (8-row padding only)
  D full adam_step on the (N, C) pytree (current production layout)
  E full adam_step on a (C, N) transposed pytree
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 131072
SHAPES = {"means": (N, 3), "quats": (N, 4), "log_scales": (N, 3),
          "sh_dc": (N, 3), "sh_rest": (N, 45), "opacity": (N, 1)}

rng = np.random.default_rng(0)
tree = {k: jnp.asarray(rng.normal(size=s).astype(np.float32))
        for k, s in SHAPES.items()}
tree_t = {k: v.T for k, v in tree.items()}
tree_flat = {k: v.reshape(-1) for k, v in tree.items()}


def bench(name, fn, *a, reps=20):
    jfn = jax.jit(fn)
    out = jfn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*a)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter() - t0) / reps * 1e3:8.3f} ms")


def ew(t):
    return jax.tree.map(lambda p: p * 1.0001 + 0.5, t)


def adam(t):
    # p, g, m, v all same shapes; classic update.
    g = jax.tree.map(lambda p: p * 0.01, t)
    m = jax.tree.map(lambda p: 0.9 * p + 0.1 * p, t)
    v = jax.tree.map(lambda p: 0.999 * p + 0.001 * (p * p), t)
    newp = jax.tree.map(
        lambda p, gg, mm, vv: p - 0.01 * mm / (jnp.sqrt(vv) + 1e-15),
        t, g, m, v)
    return newp, m, v


bench("A elementwise (N, C) as stored", ew, tree)
bench("B elementwise 1-D reshaped", ew, tree_flat)
bench("C elementwise (C, N) transposed", ew, tree_t)
bench("D adam-shaped update (N, C)", adam, tree)
bench("E adam-shaped update (C, N)", adam, tree_t)
bench("F adam-shaped update 1-D", adam, tree_flat)
