"""Pallas TPU forward rasterizer: occupancy-proportional tile compositing.

The XLA path (ops/raster.py) pads every tile to the max_per_tile ladder rung,
so compute scales with the *max* tile occupancy. This kernel walks each
tile's real entry list (mean occupancy is typically 10-60x below the max):

- XLA prologue: EWA projection -> packed rows -> (tile, depth) two-key sort
  -> per-entry gather into a depth-sorted, tile-contiguous entry table;
- Pallas kernel, grid = one step per 16x16 tile, per-tile entry counts and
  segment starts as prefetched scalars:
    while chunks remain AND transmittance > eps:
      DMA the next 128 entries (lane-major (16, 128) for the VPU alpha math
      and row-major (128, 16) for the MXU feature matmul),
      alpha   = exp(conic quadratic) rules as renderCUDA,
      logT    = running + log1p(-alpha) @ upper-triangular (MXU),
      acc    += [alpha * T_before] @ [color | depth | 1]   (MXU);
  i.e. front-to-back compositing with the CUDA early-termination (T < 1e-4),
  computed 128 entries at a time.

Numerics match ops/raster.py's composite_packed (same log-space
transmittance); tests compare both against the naive golden model.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE, num_tiles, tile_rect
from .projection import Splats2D
from .raster import ALPHA_MAX, ALPHA_MIN, T_EPS, RasterOut, pack_splats

CHUNK = 128         # entries processed per inner step (= MXU/lane width)
FEAT = 16           # packed feature columns (8 geo + up to 8 color)
LOG_T_EPS = math.log(T_EPS)


def _sorted_entries(splats: Splats2D, width: int, height: int, tile: int,
                    max_tiles_per_gauss: int):
    """(tile, depth)-sorted entry table + per-tile segments.

    Returns (entries_row (E, FEAT), entries_lane (FEAT, E), starts (T,),
    counts (T,), sorted_gauss (E,)). E = N * max_tiles_per_gauss; invalid
    entries sort to the end and are never visited (counts exclude them).
    """
    n = splats.xy.shape[0]
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    mtpg = max_tiles_per_gauss

    from .binning import capped_rect

    rmin_x, rmin_y, span_x, _, count = capped_rect(
        splats, tiles_x, tiles_y, tile, mtpg)
    depth_order = jnp.argsort(splats.depth, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[depth_order].set(
        jnp.arange(n, dtype=jnp.int32))

    slots = jnp.arange(mtpg, dtype=jnp.int32)
    safe_span_x = jnp.maximum(span_x, 1)
    off_x = slots[None, :] % safe_span_x[:, None]
    off_y = slots[None, :] // safe_span_x[:, None]
    tile_id = ((rmin_y[:, None] + off_y) * tiles_x
               + (rmin_x[:, None] + off_x)).astype(jnp.int32)
    valid = slots[None, :] < count[:, None]
    tile_id = jnp.where(valid, tile_id, t_total)

    gauss_idx = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, mtpg))
    ranks = jnp.broadcast_to(rank[:, None], (n, mtpg))
    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_id.ravel(), ranks.ravel(), gauss_idx.ravel()),
        num_keys=2, is_stable=False)

    tids = jnp.arange(t_total, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts

    # Re-pack segments CHUNK-aligned so every DMA offset is a lane multiple.
    e = n * mtpg
    e_pad = e + (CHUNK - 1) * t_total
    chunk_rows = -(-counts // CHUNK) * CHUNK          # per-tile padded length
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(chunk_rows)[:-1]])
    pos = jnp.arange(e, dtype=jnp.int32) - starts[
        jnp.minimum(sorted_tile, t_total - 1)]
    target = jnp.where(sorted_tile < t_total,
                       padded_starts[jnp.minimum(sorted_tile, t_total - 1)]
                       + pos, e_pad)
    idx_table = jnp.full((e_pad,), -1, jnp.int32).at[target].set(
        sorted_gauss, mode="drop")

    packed = pack_splats(splats)                      # (N, 8+C)
    c = packed.shape[1] - 8
    packed = jnp.pad(packed, ((0, 0), (0, FEAT - 8 - c)))
    entries_row = packed[jnp.maximum(idx_table, 0)]   # (E_pad, FEAT)
    # Dead (padding) entries must never contribute: zero their opacity.
    entries_row = jnp.where((idx_table >= 0)[:, None], entries_row, 0.0)
    return entries_row, entries_row.T, padded_starts, counts, idx_table


def _fwd_kernel(tiles_x: int, tile: int, n_color: int, bg: tuple):
    p = tile * tile

    def kernel(starts_ref, counts_ref, lane_hbm, out_ref, lane_buf, sem_l,
               slot_ref):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        nc = pl.cdiv(count, CHUNK)

        def dma(slot, off):
            return pltpu.make_async_copy(
                lane_hbm.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
                lane_buf.at[slot], sem_l.at[slot])

        # Cross-tile software pipeline: tile t's FIRST chunk is started at
        # the end of tile t-1 (parity in slot_ref[0]); most tiles have one
        # chunk, so the DMA latency hides behind the previous tile's compute
        # and output write. Within-tile extra chunks (rare) run start+wait
        # inline on the opposite slot, so an early transmittance exit can
        # never leave a DMA un-awaited.
        @pl.when(t == 0)
        def _():
            slot_ref[0] = 0

            @pl.when(count > 0)
            def _():
                dma(0, start).start()

        s0 = slot_ref[0]

        tx = (t % tiles_x) * tile
        ty = (t // tiles_x) * tile
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (tx + pix_i % tile).astype(jnp.float32)          # (P, 1)
        py = (ty + pix_i // tile).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        def chunk_body(carry):
            j, logt, tfin, acc = carry
            slot = (s0 + j) % 2

            @pl.when(j > 0)
            def _():
                dma(slot, start + j * CHUNK).start()

            dma(slot, start + j * CHUNK).wait()
            e = lane_buf[slot]                                # (FEAT, CHUNK)
            valid = (j * CHUNK + lane) < count                # (1, CHUNK)

            dx = px - e[0:1, :]                               # (P, CHUNK)
            dy = py - e[1:2, :]
            power = (-0.5 * (e[2:3, :] * dx * dx + e[4:5, :] * dy * dy)
                     - e[3:4, :] * dx * dy)
            alpha = jnp.minimum(ALPHA_MAX, e[5:6, :] * jnp.exp(power))
            alpha = jnp.where(
                (power > 0.0) | (alpha < ALPHA_MIN) | ~valid, 0.0, alpha)

            l1m = jnp.log1p(-alpha)                           # (P, CHUNK)
            tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
            log_t_after = logt + jnp.dot(
                l1m, tri, preferred_element_type=jnp.float32)
            include = log_t_after >= LOG_T_EPS
            w = jnp.where(include, alpha * jnp.exp(log_t_after - l1m), 0.0)
            tfin = jnp.minimum(
                tfin, jnp.min(jnp.where(include, log_t_after, 0.0), axis=1,
                              keepdims=True))

            # w (P, CHUNK) contracted with e (FEAT, CHUNK) on the entry
            # axis -> (P, FEAT); the MXU takes the B-transposed layout
            # directly, so no in-kernel transpose of the entry block.
            acc = acc + jax.lax.dot_general(
                w, e, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return j + 1, log_t_after[:, CHUNK - 1:CHUNK], tfin, acc

        def cond(carry):
            j, logt, _, _ = carry
            return (j < nc) & (jnp.max(logt) >= LOG_T_EPS)

        init = (jnp.int32(0), jnp.zeros((p, 1), jnp.float32),
                jnp.zeros((p, 1), jnp.float32),
                jnp.zeros((p, FEAT), jnp.float32))
        _, _, tfin, acc = jax.lax.while_loop(cond, chunk_body, init)

        # Start the next tile's first chunk (flip parity only when issued).
        n_tiles = pl.num_programs(0)

        @pl.when(t + 1 < n_tiles)
        def _():
            nxt_count = counts_ref[t + 1]

            @pl.when(nxt_count > 0)
            def _():
                dma(1 - s0, starts_ref[t + 1]).start()
                slot_ref[0] = 1 - s0

        t_final = jnp.exp(tfin)                               # (P, 1)
        # bg folded channel-by-channel as scalar constants (vector constants
        # cannot be captured by a Pallas kernel).
        for ci in range(n_color):
            out_ref[0, :, ci:ci + 1] = (acc[:, 8 + ci:9 + ci]
                                        + t_final * float(bg[ci]))
        out_ref[0, :, n_color:n_color + 1] = acc[:, 6:7]      # depth
        out_ref[0, :, n_color + 1:n_color + 2] = 1.0 - t_final

    return kernel


def rasterize_pallas(
    splats: Splats2D,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    max_tiles_per_gauss: int = 16,
    interpret: bool = False,
) -> RasterOut:
    """Forward-only Pallas rasterization (inference path; training uses the
    differentiable XLA composite)."""
    c = splats.color.shape[1]
    assert c <= FEAT - 8, f"at most {FEAT - 8} color channels"
    if bg is None:
        bg_t = (0.0,) * c
    else:
        bg_t = tuple(float(x) for x in np.asarray(bg))
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    p = tile * tile

    entries_row, entries_lane, starts, counts, _ = _sorted_entries(
        splats, width, height, tile, max_tiles_per_gauss)

    kernel = _fwd_kernel(tiles_x, tile, c, bg_t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_total,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # entries_lane (FEAT, E)
        ],
        out_specs=pl.BlockSpec((1, p, c + 2), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),   # double buffer
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),                 # prefetch parity
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_total, p, c + 2), jnp.float32),
        interpret=interpret,
    )(starts, counts, entries_lane)

    def assemble(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, tile, tile, channels)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * tile, tiles_x * tile, channels)
        return img[:height, :width]

    img = assemble(out.reshape(t_total, p, c + 2), c + 2)
    return RasterOut(color=img[..., :c].transpose(2, 0, 1),
                     depth=img[..., c], alpha=img[..., c + 1],
                     radii=splats.radius)
