"""k-nearest-neighbour mean squared distance (simple-knn replacement).

The reference initializes Gaussian scales from `simple_knn._C.distCUDA2`
(scene/gaussian_model.py:148) — mean squared distance to each point's 3
nearest neighbours, via a CUDA Morton-sort kNN. On TPU a blocked brute-force
distance matrix maps straight onto the MXU (||a-b||^2 = |a|^2 + |b|^2 - 2ab)
and is plenty fast for the 10^4-10^6 points seen at init time; the work is
O(N^2) flops but only O(N * block) memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3,
                     block: int = 1024) -> jnp.ndarray:
    """Mean squared distance from each point to its k nearest neighbours.

    Args:
      points: (N, 3) float32.
      k: neighbours (excluding self).
      block: rows per MXU block.

    Returns: (N,) float32, matching distCUDA2 semantics.
    """
    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=jnp.inf)
    sq = (pts * pts).sum(-1)                                   # (Np,)

    def one_block(start):
        rows = jax.lax.dynamic_slice(pts, (start, 0), (block, 3))
        row_sq = jax.lax.dynamic_slice(sq, (start,), (block,))
        d2 = (row_sq[:, None] + sq[None, :]
              - 2.0 * rows @ pts.T)                            # (block, Np)
        # Self-distance -> +inf (also handles padded inf rows).
        idx = jnp.arange(pts.shape[0])[None, :]
        self_mask = idx == (start + jnp.arange(block))[:, None]
        d2 = jnp.where(self_mask | ~jnp.isfinite(d2), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)                     # k smallest
        return (-neg_top).mean(axis=1)

    starts = jnp.arange(0, pts.shape[0], block)
    out = jax.lax.map(one_block, starts)                       # (Np/b, b)
    return out.reshape(-1)[:n]
