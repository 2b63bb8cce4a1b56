"""Pallas TPU forward rasterizer: occupancy-proportional tile compositing.

The XLA path (ops/raster.py) pads every tile to the max_per_tile ladder rung,
so compute scales with the *max* tile occupancy. This kernel walks each
tile's real entry list (mean occupancy is typically 10-60x below the max):

- XLA prologue: EWA projection -> packed rows -> (tile, depth) two-key sort
  -> per-entry gather into a depth-sorted, tile-contiguous entry table;
- forward Pallas kernel, grid = one step per tile, per-tile entry counts
  and CHUNK-aligned segment starts as prefetched scalars:
    while chunks remain AND transmittance > eps:
      DMA the next 128 lane-major entries (cross-tile prefetched),
      alpha   = exp(conic quadratic) rules as renderCUDA,
      logT    = running + log1p(-alpha) @ upper-triangular (MXU),
      acc    += weights @ entries  (MXU, B-transposed contraction);
  emits the full (FEAT) accumulator + final transmittance so the backward
  can recover its suffix totals exactly;
- backward Pallas kernel (custom_vjp): ONE front-to-back replay per tile
  computing dL/dalpha from suffix sums (A - prefix), chaining to
  conic/xy/opacity, writing per-entry gradients into tile-disjoint segments
  (no atomics), then a duplicate-free gather-reduction via the inverse
  expansion map.

Numerics match ops/raster.py's composite_packed (same log-space
transmittance); tests compare both against the naive golden model and the
two backends' gradients against each other.
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

from .binning import TILE, num_tiles
from .projection import Splats2D
from .raster import ALPHA_MAX, ALPHA_MIN, T_EPS, RasterOut, pack_splats

CHUNK = 128         # entries processed per inner step (= MXU/lane width)
FEAT = 16           # packed feature columns (8 geo + up to 8 color)
LOG_T_EPS = math.log(T_EPS)


def _sorted_entries(splats: Splats2D, width: int, height: int, tile: int,
                    max_tiles_per_gauss: int):
    """(tile, depth)-sorted, CHUNK-aligned entry segments.

    Returns (idx_table (E_pad,), padded_starts (T,), counts (T,),
    inv_map (N, mtpg)). idx_table maps padded entry rows -> gaussian index
    (-1 for padding); inv_map is the inverse (expansion slot -> entry row,
    e_pad sentinel when unused) used by the backward's duplicate-free
    reduction.
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
    e = n * mtpg
    orig_pos = jnp.arange(e, dtype=jnp.int32)
    sorted_tile, _, sorted_gauss, sorted_orig = jax.lax.sort(
        (tile_id.ravel(), ranks.ravel(), gauss_idx.ravel(), orig_pos),
        num_keys=2, is_stable=False)

    tids = jnp.arange(t_total, dtype=sorted_tile.dtype)
    starts = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    counts = ends - starts

    # Re-pack segments CHUNK-aligned so every DMA offset is a lane multiple.
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

    # Inverse map for the backward's duplicate-free reduction: expansion slot
    # (gauss i, slot j) -> its padded entry row (or e_pad when unused). The
    # scatter below is a pure permutation (unique indices), so it stays fast.
    inv_map = jnp.full((e,), e_pad, jnp.int32).at[sorted_orig].set(
        jnp.where(sorted_tile < t_total, target, e_pad))
    inv_map = inv_map.reshape(n, mtpg)
    return idx_table, padded_starts, counts, inv_map


def _entry_table(packed: jnp.ndarray, idx_table: jnp.ndarray) -> jnp.ndarray:
    """(E_pad, FEAT) gathered rows, zeroed for padding entries."""
    c = packed.shape[1] - 8
    packed = jnp.pad(packed, ((0, 0), (0, FEAT - 8 - c)))
    rows = packed[jnp.maximum(idx_table, 0)]
    return jnp.where((idx_table >= 0)[:, None], rows, 0.0)


def _fwd_kernel(tiles_x: int, tile: int):
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

        # Emit the FULL feature accumulator + final transmittance: the
        # backward recovers its suffix total A = g . acc exactly from this
        # (no replay pass), and the caller assembles color/depth/alpha
        # (background is applied outside the kernel, differentiably).
        out_ref[0, :, 0:FEAT] = acc
        out_ref[0, :, FEAT:FEAT + 1] = jnp.exp(tfin)

    return kernel


def _bwd_kernel(tiles_x: int, tile: int):
    """Gradient replay: one front-to-back pass per tile.

    The cotangent g arrives in the RAW output layout (acc FEAT cols +
    t_final), so its first FEAT columns ARE the per-feature weight
    gradients, and the suffix machinery reduces to:
        u_k      = dL/dw_k = g[:, :FEAT] . e_k
        dL/da_k  = T_b_k u_k - (A - prefix_k)/(1-a_k) - c2/(1-a_k)
    where A = g . acc (computed exactly in XLA from the stored forward
    accumulator — no replay pass) and c2 = g_tfinal * t_final is the
    final-transmittance chain. Entry-gradient rows live in tile-disjoint
    segments, so writes need no atomics (unlike the CUDA backward).
    """
    p = tile * tile

    def kernel(starts_ref, counts_ref, lane_hbm, g_ref, a_ref, out_hbm,
               lane_buf, dent_buf, sem_in, sem_out):
        t = pl.program_id(0)
        start = starts_ref[t]
        count = counts_ref[t]
        nc = pl.cdiv(count, CHUNK)

        tx = (t % tiles_x) * tile
        ty = (t // tiles_x) * tile
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        px = (tx + pix_i % tile).astype(jnp.float32)
        py = (ty + pix_i // tile).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

        gmat = g_ref[0][:, 0:FEAT]                            # (P, FEAT)
        a_total = a_ref[0][:, 0:1]                            # (P, 1)
        c2 = a_ref[0][:, 1:2]                                 # g_tfin*t_final

        def alpha_w_u(j, logt):
            """Shared replay math for one chunk (assumes entry chunk j is in
            lane_buf). Returns (e, dx, dy, power, ep, raw, alpha, live,
            t_before, include, w, u, new_logt)."""
            e = lane_buf[:]                                   # (FEAT, CHUNK)
            valid = (j * CHUNK + lane) < count
            dx = px - e[0:1, :]
            dy = py - e[1:2, :]
            power = (-0.5 * (e[2:3, :] * dx * dx + e[4:5, :] * dy * dy)
                     - e[3:4, :] * dx * dy)
            ep = jnp.exp(power)
            raw = e[5:6, :] * ep
            alpha = jnp.minimum(ALPHA_MAX, raw)
            live = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
            alpha = jnp.where(live, alpha, 0.0)
            l1m = jnp.log1p(-alpha)
            tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
            log_t_after = logt + jnp.dot(
                l1m, tri, preferred_element_type=jnp.float32)
            include = log_t_after >= LOG_T_EPS
            t_before = jnp.exp(log_t_after - l1m)
            w = jnp.where(include, alpha * t_before, 0.0)
            u = jax.lax.dot_general(
                gmat, e, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (P, CHUNK)
            return (e, dx, dy, power, ep, raw, alpha, live, t_before,
                    include, w, u, log_t_after)

        def load(j):
            off = pl.multiple_of(start + j * CHUNK, CHUNK)
            dma_in = pltpu.make_async_copy(
                lane_hbm.at[:, pl.ds(off, CHUNK)], lane_buf, sem_in)
            dma_in.start()
            dma_in.wait()
            return off

        def chunk_body(j, carry):
            logt, prefix_carry = carry
            off = load(j)
            (e, dx, dy, power, ep, raw, alpha, live, t_before, include, w,
             u, log_t_after) = alpha_w_u(j, logt)
            tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
            pu = w * u
            prefix = prefix_carry + jnp.dot(
                pu, tri, preferred_element_type=jnp.float32)   # (P, CHUNK)
            suffix = a_total - prefix
            grad_ok = live & include & (raw < ALPHA_MAX)
            dalpha = jnp.where(
                grad_ok,
                t_before * u - (suffix + c2) / (1.0 - alpha), 0.0)
            dpow = dalpha * alpha                              # (P, CHUNK)
            dop = dalpha * jnp.where(grad_ok, ep, 0.0)

            # Per-entry reductions over pixels (rows = FEAT layout).
            fg = jax.lax.dot_general(
                gmat, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (FEAT, CHUNK)
            a_, b_, c_ = e[2:3, :], e[3:4, :], e[4:5, :]
            geo = jnp.concatenate([
                jnp.sum(dpow * (a_ * dx + b_ * dy), 0, keepdims=True),
                jnp.sum(dpow * (b_ * dx + c_ * dy), 0, keepdims=True),
                jnp.sum(-0.5 * dx * dx * dpow, 0, keepdims=True),
                jnp.sum(-dx * dy * dpow, 0, keepdims=True),
                jnp.sum(-0.5 * dy * dy * dpow, 0, keepdims=True),
                jnp.sum(dop, 0, keepdims=True),
            ], axis=0)                                         # (6, CHUNK)
            # rows 0-5 of fg are zero (gmat has no geometry columns).
            dent_buf[:] = jnp.concatenate([geo, fg[6:, :]], axis=0)
            dma_out = pltpu.make_async_copy(
                dent_buf, out_hbm.at[:, pl.ds(off, CHUNK)], sem_out)
            dma_out.start()
            dma_out.wait()
            return (log_t_after[:, CHUNK - 1:CHUNK],
                    prefix[:, CHUNK - 1:CHUNK])

        jax.lax.fori_loop(
            0, nc, chunk_body,
            (jnp.zeros((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32)))

    return kernel


@functools.lru_cache(maxsize=64)
def _composite_fns(tiles_x: int, t_total: int, tile: int, c: int,
                   interpret: bool):
    """custom_vjp'd (packed, idx_table, starts, counts, inv_map) ->
    raw per-tile accumulators (T, P, FEAT+1): full feature sums + final
    transmittance. Background is applied by the caller (differentiable XLA),
    which keeps the kernels bg-free and lets the backward recover its suffix
    total A = g . acc without a replay pass."""
    p = tile * tile

    def run_fwd(entries_lane, starts, counts):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_total,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, p, FEAT + 1),
                                   lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )
        return pl.pallas_call(
            _fwd_kernel(tiles_x, tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_total, p, FEAT + 1),
                                           jnp.float32),
            interpret=interpret,
        )(starts, counts, entries_lane)

    @jax.custom_vjp
    def comp(packed, idx_table, starts, counts, inv_map):
        return run_fwd(_entry_table(packed, idx_table).T, starts, counts)

    def comp_fwd(packed, idx_table, starts, counts, inv_map):
        # The entry table is both the forward input and the backward's replay
        # data — keep it as a residual instead of re-gathering E_pad rows.
        entries_lane = _entry_table(packed, idx_table).T
        out = run_fwd(entries_lane, starts, counts)
        return out, (entries_lane, idx_table, starts, counts, inv_map, out)

    def comp_bwd(res, g):
        entries_lane, idx_table, starts, counts, inv_map, out = res
        e_pad = idx_table.shape[0]
        # g is the cotangent of the RAW output (acc cols + t_final).
        # Suffix total per pixel, EXACTLY linear in the stored accumulator:
        # A = sum_k w_k u_k = g[:, :FEAT] . acc; plus the t_final chain
        # constant c2 = g_tfin * t_final.
        a_total = (g[..., :FEAT] * out[..., :FEAT]).sum(-1, keepdims=True)
        c2 = g[..., FEAT:FEAT + 1] * out[..., FEAT:FEAT + 1]
        aux = jnp.concatenate([a_total, c2], axis=-1)         # (T, P, 2)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(t_total,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),        # entries
                pl.BlockSpec((1, p, FEAT + 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),       # g
                pl.BlockSpec((1, p, 2), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),       # [A, c2]
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # dentries lane
            scratch_shapes=[
                pltpu.VMEM((FEAT, CHUNK), jnp.float32),
                pltpu.VMEM((FEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        dent_lane = pl.pallas_call(
            _bwd_kernel(tiles_x, tile),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((FEAT, e_pad), jnp.float32),
            interpret=interpret,
        )(starts, counts, entries_lane, g, aux)

        # Duplicate-free reduction back to per-splat grads: each splat's
        # <= mtpg entry rows are known a priori (inv_map), so the transpose
        # of the entry gather is a plain gather + sum — no TPU scatter.
        dent = dent_lane.T                                   # (E_pad, FEAT)
        safe = jnp.minimum(inv_map, e_pad - 1)
        rows = dent[safe]                                    # (N, mtpg, FEAT)
        rows = jnp.where((inv_map < e_pad)[..., None], rows, 0.0)
        dpacked = rows.sum(axis=1)[:, :8 + c]
        from jax import dtypes

        f0 = lambda x: np.zeros(x.shape, dtypes.float0)
        return (dpacked, f0(idx_table), f0(starts), f0(counts), f0(inv_map))

    comp.defvjp(comp_fwd, comp_bwd)
    return comp


def rasterize_pallas(
    splats: Splats2D,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    max_tiles_per_gauss: int = 16,
    interpret: bool = False,
) -> RasterOut:
    """Differentiable Pallas rasterization (custom_vjp backward kernel)."""
    c = splats.color.shape[1]
    assert c <= FEAT - 8, f"at most {FEAT - 8} color channels"
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    p = tile * tile

    idx_table, starts, counts, inv_map = _sorted_entries(
        jax.lax.stop_gradient(splats), width, height, tile,
        max_tiles_per_gauss)
    packed = pack_splats(splats)
    comp = _composite_fns(tiles_x, t_total, tile, c, interpret)
    out = comp(packed, idx_table, starts, counts, inv_map)

    def assemble(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, tile, tile, channels)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            tiles_y * tile, tiles_x * tile, channels)
        return img[:height, :width]

    # Raw layout: packed feature accumulator (FEAT cols) + final
    # transmittance. The kernel composites over black; bg is applied here
    # (differentiable XLA), so bg may be a traced array.
    img = assemble(out.reshape(t_total, p, FEAT + 1), FEAT + 1)
    color = img[..., 8:8 + c].transpose(2, 0, 1)
    alpha = 1.0 - img[..., FEAT]
    if bg is not None:
        color = color + (1.0 - alpha)[None] * jnp.asarray(bg)[:, None, None]
    return RasterOut(color=color, depth=img[..., 6], alpha=alpha,
                     radii=splats.radius)
