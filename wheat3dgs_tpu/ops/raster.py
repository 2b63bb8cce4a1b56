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
    # Entry-stream telemetry (Pallas backend only; None on the XLA path):
    # allocation demand (sum of covered-rect areas) and post-cull entry
    # count. demand > entry_budget means entries were cropped this call.
    entries_total: Optional[jnp.ndarray] = None   # scalar int32
    entries_alive: Optional[jnp.ndarray] = None   # scalar int32


def _tile_pixel_grid(tile: int) -> jnp.ndarray:
    ys, xs = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    return jnp.stack([xs.ravel(), ys.ravel()], axis=1)        # (P, 2)


# --- packed fast path --------------------------------------------------------
#
# Two measured XLA bottlenecks shape this layout (v5e, 1600x1200, K=512):
# gathering 5 separate per-splat arrays per tile costs ~84 ms vs ~12 ms for
# one packed (N, 8+C) row gather, and jnp.cumprod along the K axis costs
# ~160 ms vs ~10 ms for a chunked cumulative sum of log1p(-alpha) done as
# (P, 128) @ (128, 128) upper-triangular matmuls on the MXU.

_CHUNK = 128  # cumsum chunk = MXU tile width


def pack_splats(splats: Splats2D) -> jnp.ndarray:
    """(N, 8 + C): xy(2) conic(3) opacity(1) depth(1) pad(1) color(C)."""
    n = splats.xy.shape[0]
    return jnp.concatenate(
        [splats.xy, splats.conic, splats.opacity[:, None],
         splats.depth[:, None], jnp.zeros((n, 1), splats.xy.dtype),
         splats.color], axis=1)


def tile_alpha(pix: jnp.ndarray, p: jnp.ndarray, valid: jnp.ndarray
               ) -> jnp.ndarray:
    """(P, K) alphas for one tile from packed rows (CUDA renderCUDA rules:
    0.99 clamp, skip power > 0 and alpha < 1/255)."""
    d = pix[:, None, :] - p[None, :, 0:2]
    power = (-0.5 * (p[None, :, 2] * d[..., 0] ** 2
                     + p[None, :, 4] * d[..., 1] ** 2)
             - p[None, :, 3] * d[..., 0] * d[..., 1])
    alpha = jnp.minimum(ALPHA_MAX, p[None, :, 5] * jnp.exp(power))
    return jnp.where((power > 0.0) | (alpha < ALPHA_MIN) | ~valid[None, :],
                     0.0, alpha)


def transmittance(alpha: jnp.ndarray):
    """(t_before, t_after) = exclusive/inclusive prod of (1 - alpha) along K,
    via exp(chunked-cumsum(log1p(-alpha))) with the in-chunk cumsum as an
    upper-triangular MXU matmul. alpha <= 0.99 keeps the log finite."""
    pdim, k0 = alpha.shape
    pad = (-k0) % _CHUNK
    if pad:
        alpha = jnp.pad(alpha, ((0, 0), (0, pad)))
    k = k0 + pad
    nc = k // _CHUNK
    tri = jnp.triu(jnp.ones((_CHUNK, _CHUNK), jnp.float32))
    l = jnp.log1p(-alpha).reshape(pdim, nc, _CHUNK)
    within = jax.lax.dot_general(
        l, tri, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # (P, nc, CHUNK) inclusive
    carry = jnp.cumsum(l.sum(-1), axis=1)
    carry = jnp.concatenate(
        [jnp.zeros((pdim, 1), l.dtype), carry[:, :-1]], axis=1)
    log_t_after = (within + carry[:, :, None]).reshape(pdim, k)
    t_after = jnp.exp(log_t_after)
    t_before = jnp.exp(log_t_after - l.reshape(pdim, k))
    return t_before[:, :k0], t_after[:, :k0]


def composite_packed(pix: jnp.ndarray, p: jnp.ndarray, valid: jnp.ndarray,
                     bg: jnp.ndarray):
    """Packed-row equivalent of composite_tile. p: (K, 8+C) depth-ascending.
    Returns (color (P, C), depth (P,), alpha (P,), weights (P, K))."""
    c = p.shape[1] - 8
    alpha = tile_alpha(pix, p, valid)
    t_before, t_after = transmittance(alpha)
    include = t_after >= T_EPS
    w = jnp.where(include, alpha * t_before, 0.0)
    t_final = jnp.where(include.any(axis=1),
                        jnp.min(jnp.where(include, t_after, 1.0), axis=1),
                        1.0)
    feats = jnp.concatenate([p[:, 8:], p[:, 6:7]], axis=1)    # color + depth
    acc = jnp.dot(w, feats, preferred_element_type=jnp.float32)
    out_color = acc[:, :c] + t_final[:, None] * bg[None, :]
    return out_color, acc[:, c], w.sum(axis=1), w


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
    packed = pack_splats(splats)                              # (N, 8+C)

    def one_tile(args):
        tid, tvalid, origin = args
        pix = pix0 + origin[None, :]
        out_c, out_d, out_a, _ = composite_packed(
            pix, packed[tid], tvalid, bg)
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
