"""Tiled differentiable rasterization forward (stage 2: composite).

Consumes Splats2D (ops/projection.py) + TileBins (ops/binning.py) and
produces color/depth/alpha images. The per-tile composite expresses
front-to-back alpha blending with a cumulative-product transmittance so the
final reduction is one (pixels x K) @ (K x channels) matmul — MXU-shaped.
The whole path is pure jnp and differentiable (gradients flow through the
gathers back to the N Gaussian arrays as scatter-adds); the Pallas kernel in
ops/pallas_raster.py is a drop-in faster forward/backward for the same math.

Semantics match the reference CUDA renderCUDA loop (see
ops/reference_raster.py for the golden model and the constant definitions).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import TILE, TileBins, bin_splats, num_tiles
from .projection import Splats2D
from .reference_raster import ALPHA_MAX, ALPHA_MIN, T_EPS


class RasterOut(NamedTuple):
    color: jnp.ndarray      # (C, H, W)
    depth: jnp.ndarray      # (H, W) alpha-weighted accumulated view depth
    alpha: jnp.ndarray      # (H, W) 1 - final transmittance
    radii: jnp.ndarray      # (N,) int32 screen radius (0 = culled)


def _tile_pixel_grid(tile: int) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    return jnp.stack([xs.ravel(), ys.ravel()], axis=1)        # (P, 2)


def composite_tile(pix_xy, xy, conic, color, opac, depth, valid, bg):
    """Composite K depth-ordered splats over P pixels (one tile).

    Args:
      pix_xy: (P, 2). xy/conic/color/opac/depth: (K, ...) gathered, depth
        ascending. valid: (K,) bool. bg: (C,).
    Returns (P, C) color, (P,) depth, (P,) alpha, (P, K) weights.
    """
    d = pix_xy[:, None, :] - xy[None, :, :]                   # (P, K, 2)
    power = (-0.5 * (conic[None, :, 0] * d[..., 0] ** 2
                     + conic[None, :, 2] * d[..., 1] ** 2)
             - conic[None, :, 1] * d[..., 0] * d[..., 1])
    alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_MIN)
                      | ~valid[None, :], 0.0, alpha)          # (P, K)

    one_minus = 1.0 - alpha
    t_after = jnp.cumprod(one_minus, axis=1)
    include = t_after >= T_EPS
    t_before = t_after / jnp.where(one_minus == 0.0, 1.0, one_minus)
    w = jnp.where(include, alpha * t_before, 0.0)             # (P, K)

    # include is a prefix mask (t_after non-increasing): final transmittance
    # = t_after at the last included position = min over the included prefix.
    t_final = jnp.where(include.any(axis=1),
                        jnp.min(jnp.where(include, t_after, 1.0), axis=1), 1.0)
    feats = jnp.concatenate([color, depth[:, None]], axis=1)  # (K, C+1)
    acc = w @ feats                                           # MXU matmul
    out_color = acc[:, :-1] + t_final[:, None] * bg[None, :]
    return out_color, acc[:, -1], w.sum(axis=1), w


def rasterize(
    splats: Splats2D,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    max_tiles_per_gauss: int = 16,
    max_per_tile: int = 512,
    tile_batch: int = 64,
    bins: Optional[TileBins] = None,
    remat: bool = True,
) -> RasterOut:
    """Rasterize one view. Static shapes throughout; jit/vmap friendly.

    remat=True wraps the per-tile composite in jax.checkpoint so the backward
    recomputes the (pixels x K) alpha/transmittance matrices instead of
    storing them — the same trade the reference CUDA backward makes by
    replaying the forward walk, and necessary to fit HBM at high
    resolution/occupancy.
    """
    c = splats.color.shape[1]
    if bg is None:
        bg = jnp.zeros((c,), splats.color.dtype)
    tiles_x, tiles_y = num_tiles(width, height, tile)
    if bins is None:
        bins = bin_splats(splats, width, height, tile,
                          max_tiles_per_gauss, max_per_tile)

    idx = bins.tile_lists                                     # (T, K)
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    pix0 = _tile_pixel_grid(tile)                             # (P, 2)
    origins = jnp.stack(
        [(jnp.arange(tiles_x * tiles_y, dtype=jnp.int32) % tiles_x) * tile,
         (jnp.arange(tiles_x * tiles_y, dtype=jnp.int32) // tiles_x) * tile],
        axis=1).astype(jnp.float32)                           # (T, 2)

    def one_tile(args):
        tid, tvalid, origin = args
        xy = splats.xy[tid]
        conic = splats.conic[tid]
        col = splats.color[tid]
        opac = splats.opacity[tid]
        dep = splats.depth[tid]
        pix = pix0 + origin[None, :]
        out_c, out_d, out_a, _ = composite_tile(
            pix, xy, conic, col, opac, dep, tvalid, bg)
        return out_c, out_d, out_a

    if remat:
        one_tile = jax.checkpoint(one_tile)
    out_c, out_d, out_a = jax.lax.map(
        one_tile, (safe, valid, origins), batch_size=tile_batch)

    p = tile * tile

    def assemble(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, tile, tile, channels)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * tile, tiles_x * tile, channels)
        return img[:height, :width]

    color = assemble(out_c.reshape(-1, p, c), c).transpose(2, 0, 1)
    depth = assemble(out_d.reshape(-1, p, 1), 1)[..., 0]
    alpha = assemble(out_a.reshape(-1, p, 1), 1)[..., 0]
    return RasterOut(color=color, depth=depth, alpha=alpha, radii=splats.radius)
