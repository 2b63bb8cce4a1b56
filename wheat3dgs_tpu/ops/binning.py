"""Tile binning: which Gaussians touch which image tile, in depth order.

TPU-native replacement for the CUDA duplicate-key radix sort
(reference rasterizer internals; see SURVEY.md C21). The GPU builds
(tile | depth) 64-bit keys and radix-sorts them; here we:

1. expand each visible Gaussian into its covered tile rectangle
   (row-major, a static cap of `max_tiles_per_gauss` slots each),
2. two-key `jax.lax.sort` on (tile_id, depth_rank) — XLA's sort maps well
   to TPU and the shapes are static,
3. segment the sorted stream per tile and scatter positions into a dense
   (num_tiles, max_per_tile) index table for the per-tile composite kernel.

Everything is integer bookkeeping — no gradients flow through this module;
gradients flow through the *gathers* that consume the index table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Splats2D

TILE = 16  # pixels per tile side (matches the reference's 16x16 CUDA tiles)


def num_tiles(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return (-(-width // tile), -(-height // tile))


class TileBins(NamedTuple):
    tile_lists: jnp.ndarray   # (T, K) int32 gaussian index, -1 padded
    tile_counts: jnp.ndarray  # (T,) int32 entries per tile (uncapped count)
    depth_order: jnp.ndarray  # (N,) int32 argsort of depth


def tile_rect(xy: jnp.ndarray, radius: jnp.ndarray, tiles_x: int,
              tiles_y: int, tile: int = TILE):
    """Covered tile rectangle per splat (reference CUDA getRect semantics)."""
    rmin_x = jnp.clip(((xy[:, 0] - radius) / tile).astype(jnp.int32), 0, tiles_x)
    rmin_y = jnp.clip(((xy[:, 1] - radius) / tile).astype(jnp.int32), 0, tiles_y)
    rmax_x = jnp.clip(((xy[:, 0] + radius + tile - 1) / tile).astype(jnp.int32),
                      0, tiles_x)
    rmax_y = jnp.clip(((xy[:, 1] + radius + tile - 1) / tile).astype(jnp.int32),
                      0, tiles_y)
    return rmin_x, rmin_y, rmax_x, rmax_y


def ellipse_aabb(splats: Splats2D):
    """Per-axis half-extents of the EXACT alpha>=1/255 level-set ellipse.

    The CUDA reference bins by a 3-sigma bounding SQUARE
    (my_radius = ceil(3 sqrt(max eigenvalue)), getRect) — for anisotropic
    splats that square is up to (9/q)(sigma_max/sigma_min)x larger than the
    pixels the compositor can ever shade above its 1/255 alpha floor. The
    exact AABB of the floor's level set q(d) <= q_max = 2 ln(255 o) has
    half-extents w_x = sqrt(q_max Sigma_xx), w_y = sqrt(q_max Sigma_yy)
    (Sigma = conic^-1, so Sigma_xx = c/det). Capped at the reference radius
    so the rect is never LARGER than the CUDA one (the reference's 3-sigma
    box crops alpha up to o*e^{-4.5}; keeping that cap keeps outputs
    bit-identical to the radius-box path) — allocation demand only shrinks.
    """
    a, b, c = splats.conic[:, 0], splats.conic[:, 1], splats.conic[:, 2]
    det = a * c - b * b
    q_max = jnp.maximum(2.0 * jnp.log(
        jnp.maximum(splats.opacity, 1e-12) * 255.0), 0.0) + 1e-3
    r = splats.radius.astype(jnp.float32)
    good = det > 1e-12
    wx = jnp.sqrt(jnp.maximum(q_max * c / jnp.where(good, det, 1.0), 0.0))
    wy = jnp.sqrt(jnp.maximum(q_max * a / jnp.where(good, det, 1.0), 0.0))
    wx = jnp.where(good, jnp.minimum(wx + 1e-3, r), r)
    wy = jnp.where(good, jnp.minimum(wy + 1e-3, r), r)
    return wx, wy


def capped_rect(splats: Splats2D, tiles_x: int, tiles_y: int, tile: int,
                max_tiles_per_gauss: int):
    """Covered-rect per splat, center-cropped to <= max_tiles_per_gauss tiles.

    The rect is the exact alpha-floor ellipse AABB (see ellipse_aabb), not
    the reference's 3-sigma square — same shaded pixels, far fewer allocated
    slots on anisotropic splats. A splat whose rect exceeds the static
    expansion cap keeps a centered window instead of the row-major prefix
    (a prefix would crop splats to a top band — a visible artifact on the
    rare huge splats early in training).
    Returns (rmin_x, rmin_y, span_x, span_y, count).
    """
    m = max_tiles_per_gauss
    wx, wy = ellipse_aabb(splats)
    # Intersect the exact (floor/ceil) AABB tile rect with the reference
    # getRect radius rect. The reference formula trunc((x+r+tile-1)/tile)
    # is only a true ceil for the radius values it is used with — applying
    # it to the smaller wx/wy can EXCLUDE a boundary tile the radius rect
    # includes (and whose pixels shade above 1/255). The intersection is
    # never larger than the reference rect (bit-exact outputs) and never
    # drops a pixel the reference rect shades.
    r = splats.radius.astype(splats.xy.dtype)
    ref_x0, ref_y0, ref_x1, ref_y1 = tile_rect(
        splats.xy, r, tiles_x, tiles_y, tile)
    rmin_x = jnp.maximum(ref_x0, jnp.clip(jnp.floor(
        (splats.xy[:, 0] - wx) / tile).astype(jnp.int32), 0, tiles_x))
    rmin_y = jnp.maximum(ref_y0, jnp.clip(jnp.floor(
        (splats.xy[:, 1] - wy) / tile).astype(jnp.int32), 0, tiles_y))
    rmax_x = jnp.minimum(ref_x1, jnp.clip(jnp.floor(
        (splats.xy[:, 0] + wx) / tile).astype(jnp.int32) + 1, 0, tiles_x))
    rmax_y = jnp.minimum(ref_y1, jnp.clip(jnp.floor(
        (splats.xy[:, 1] + wy) / tile).astype(jnp.int32) + 1, 0, tiles_y))
    rmax_x = jnp.maximum(rmax_x, rmin_x)
    rmax_y = jnp.maximum(rmax_y, rmin_y)
    span_x = rmax_x - rmin_x
    span_y = rmax_y - rmin_y
    area = jnp.maximum(span_x * span_y, 1)
    scale = jnp.sqrt(m / area.astype(jnp.float32))
    new_sx = jnp.clip(jnp.floor(span_x * jnp.minimum(scale, 1.0)), 1,
                      span_x).astype(jnp.int32)
    new_sx = jnp.minimum(new_sx, m)
    new_sy = jnp.clip(m // jnp.maximum(new_sx, 1), 1, span_y)
    over = span_x * span_y > m
    sx = jnp.where(over, new_sx, span_x)
    sy = jnp.where(over, new_sy, span_y)
    rx = jnp.where(over, rmin_x + (span_x - sx) // 2, rmin_x)
    ry = jnp.where(over, rmin_y + (span_y - sy) // 2, rmin_y)
    count = jnp.where(splats.radius > 0, sx * sy, 0)
    return rx, ry, sx, sy, count


def count_tiles(splats: Splats2D, width: int, height: int, tile: int = TILE,
                max_tiles_per_gauss: int = 16) -> jnp.ndarray:
    """(T,) exact per-tile entry counts WITHOUT building the sorted lists.

    Cheap occupancy probe for the adaptive max_per_tile ladder: the composite
    kernels' K is a static shape, so the host reads these counts (every
    densify interval, not every step) and picks the smallest ladder rung that
    covers the scene — padding work scales with real occupancy instead of a
    worst-case constant.
    """
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    mtpg = max_tiles_per_gauss
    rmin_x, rmin_y, span_x, _, count = capped_rect(
        splats, tiles_x, tiles_y, tile, mtpg)
    slots = jnp.arange(mtpg, dtype=jnp.int32)
    safe_span_x = jnp.maximum(span_x, 1)
    off_x = slots[None, :] % safe_span_x[:, None]
    off_y = slots[None, :] // safe_span_x[:, None]
    tile_id = ((rmin_y[:, None] + off_y) * tiles_x
               + (rmin_x[:, None] + off_x))
    valid = slots[None, :] < count[:, None]
    tile_id = jnp.where(valid, tile_id, t_total)
    return jnp.zeros((t_total,), jnp.int32).at[tile_id.ravel()].add(
        1, mode="drop")


MAX_PER_TILE_LADDER = (128, 256, 512, 1024, 2048, 4096)
# Cap 32: long post-densify training legitimately grows grazing-angle
# ground splats past 16 tiles of 32px; cropping them biases the gradients
# (the splat's rendered mass is less than the EWA math expects, so the
# optimizer inflates it further — measured as a runaway footprint bloat
# and a 7+ dB render loss on 30k-iter models). With the budget-sliced
# entry stream only the reduction sort scales with mtpg, so rung 32 costs
# ~10 ms only when actually needed.
MTPG_LADDER = (4, 8, 16, 32)


def pick_mtpg(p99_area: int, ladder=MTPG_LADDER) -> int:
    """Expansion cap covering the 99th-percentile splat tile footprint
    (outliers get center-cropped by capped_rect — graceful)."""
    for rung in ladder:
        if rung >= p99_area:
            return rung
    return ladder[-1]


def pick_entry_budget(total_entries: int, headroom: float = 1.25,
                      floor: int = 1 << 17) -> int:
    """Smallest {1, 1.25, 1.5, 1.75} * 2^k rung >= headroom * the probed
    allocation demand (the Pallas backend's exact-allocation size; see
    pallas_raster._alloc_entries). Quarter-steps keep ALL entry-stream cost
    (sorts, kernels, gradient reduction scale with the budget) within ~20%
    of the demand instead of up to 2x on pow2-only rungs. The 1.25 default
    headroom is safe because overflow is *detected* per step (entry
    telemetry) and the budget auto-raises, rather than cropping silently."""
    need = max(float(floor), total_entries * headroom)
    rung = floor
    while rung < need:
        for num in (5, 6, 7):
            q = rung // 4 * num
            if q >= need and q % 128 == 0:
                return q
        rung *= 2
    return rung


def pick_max_per_tile(max_count: int, headroom: float = 1.3,
                      ladder=MAX_PER_TILE_LADDER) -> int:
    """Smallest ladder rung >= headroom * observed max tile occupancy."""
    need = max_count * headroom
    for rung in ladder:
        if rung >= need:
            return rung
    return ladder[-1]


def bin_splats(splats: Splats2D, width: int, height: int, tile: int = TILE,
               max_tiles_per_gauss: int = 16,
               max_per_tile: int = 512) -> TileBins:
    """Build per-tile depth-ordered Gaussian index lists.

    Truncations (both static caps) drop the *farthest* entries:
    - a Gaussian covering more than ``max_tiles_per_gauss`` tiles loses its
      trailing (row-major) tiles — rare after the radius/opacity culls;
    - a tile with more than ``max_per_tile`` entries keeps the nearest ones,
      which is the principled cap since closer splats occlude farther ones.
    """
    n = splats.xy.shape[0]
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    mtpg = max_tiles_per_gauss

    rmin_x, rmin_y, span_x, _, count = capped_rect(
        splats, tiles_x, tiles_y, tile, mtpg)

    # Depth rank as secondary sort key (stable ordering identical to CUDA's
    # depth-ascending within a tile).
    depth_order = jnp.argsort(splats.depth, stable=True)       # (N,)
    rank = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32))

    # Expand: slot j of splat i covers tile (rmin + (j%span_x, j//span_x)).
    slots = jnp.arange(mtpg, dtype=jnp.int32)                  # (M,)
    safe_span_x = jnp.maximum(span_x, 1)
    off_x = slots[None, :] % safe_span_x[:, None]              # (N, M)
    off_y = slots[None, :] // safe_span_x[:, None]
    tile_id = ((rmin_y[:, None] + off_y) * tiles_x
               + (rmin_x[:, None] + off_x)).astype(jnp.int32)
    valid = slots[None, :] < count[:, None]
    tile_id = jnp.where(valid, tile_id, t_total)               # sentinel last

    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, mtpg))
    ranks = jnp.broadcast_to(rank[:, None], (n, mtpg))

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_id.ravel(), ranks.ravel(), gauss_idx.ravel()),
        num_keys=2, is_stable=False)

    # Per-tile segments in the sorted stream.
    tids = jnp.arange(t_total, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left")
    ends = jnp.searchsorted(sorted_tile, tids, side="right")
    tile_counts = (ends - starts).astype(jnp.int32)

    # Dense (T, K) table: entry e lands at (tile, e - starts[tile]).
    e = n * mtpg
    pos = jnp.arange(e, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_tile, t_total - 1)].astype(jnp.int32)
    flat_idx = sorted_tile.astype(jnp.int32) * max_per_tile + pos
    ok = (sorted_tile < t_total) & (pos < max_per_tile)
    flat_idx = jnp.where(ok, flat_idx, t_total * max_per_tile)  # dropped
    tile_lists = jnp.full((t_total * max_per_tile,), -1, jnp.int32)
    tile_lists = tile_lists.at[flat_idx].set(sorted_gauss, mode="drop")
    return TileBins(tile_lists.reshape(t_total, max_per_tile),
                    tile_counts, depth_order)
