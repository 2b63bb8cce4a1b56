"""Pallas TPU forward rasterizer: occupancy-proportional tile compositing.

The XLA path (ops/raster.py) pads every tile to the max_per_tile ladder rung,
so compute scales with the *max* tile occupancy. This kernel walks each
tile's real entry list (mean occupancy is typically 10-60x below the max):

- XLA prologue, EXACT-ENTRY ALLOCATION (round 3): instead of a fixed-width
  N x max_tiles_per_gauss expansion (which paid capacity*mtpg sort cost for
  ~12% real entries), each visible splat is allocated exactly its covered
  tile-rect area of slots inside one static `entry_budget`-sized array:
  exclusive-cumsum offsets -> scatter-max of the gaussian index at each
  offset -> running-max gives every slot its owner. A slot decodes to
  (gaussian, tile) with an exact small-int division, then a PRECISE
  ellipse/tile intersection test (min of the conic quadratic over the tile
  box vs the 1/255 alpha floor) retires slots the compositor would floor
  to zero anyway — bit-exact with the kernels' per-pixel ALPHA_MIN clamp,
  and it removes roughly half the entries on dense scenes (grazing-angle
  splats have large bounding rects but thin ellipses). Surviving slots get
  a (tile << rank_bits | depth_rank) packed key; ONE single-key sort over
  budget-many keys, per-tile segment bounds by searchsorted, payload gather
  for the sorted entries. Entries stay in COMPACT sorted order: the kernels
  walk each tile's segment from its 128-aligned floor and mask the
  out-of-segment lanes, so no padded entry table and no big scatters;
- forward Pallas kernel, grid = one step per tile, per-tile segment bounds
  as prefetched scalars:
    while chunks remain AND transmittance > eps:
      DMA the next 128 lane-major entries (cross-tile prefetched),
      alpha   = exp(conic quadratic) rules as renderCUDA,
      logT    = running + log1p(-alpha) @ upper-triangular (MXU),
      acc    += weights @ entries  (MXU, B-transposed contraction);
  emits the full (FEAT) accumulator + final transmittance so the backward
  can recover its suffix totals exactly;
- backward Pallas kernel (custom_vjp): ONE front-to-back replay per tile
  computing dL/dalpha from suffix sums (A - prefix), chaining to
  conic/xy/opacity, writing per-entry gradients at the entries' sorted
  positions. Chunks straddling a tile boundary are accumulated through an
  in-VMEM carry (the sequential TPU grid makes the previous tile's partial
  available), so no atomics and no read-modify-write of HBM;
- per-splat gradients: ONE single-key sort of the bf16-pair-packed entry
  gradients keyed on the owning depth rank (grouping each gaussian's
  entries contiguously), then a mask-matmul Pallas segment-sum over the
  ANALYTIC per-rank segment bounds (computed at N scale during
  allocation — an E-scale searchsorted here measured 18.7 ms). Both scale
  with entry_budget, not with capacity x footprint. Payload columns cross
  the custom_vjp boundary bitcast to uint32 so no zero-cotangent backward
  graph is built for the entry stream (~10 ms of pure zero propagation
  otherwise).

Overflow telemetry: the allocation demand (total covered-rect area) and
the post-cull entry count are returned with every render; demand above the
budget means the tail gaussians' entries were cropped this step, and the
training loop reacts by re-probing / raising the budget rung (see
training.Trainer) instead of cropping silently.

Numerics match ops/raster.py's composite_packed (same log-space
transmittance); tests compare both against the naive golden model and the
two backends' gradients against each other.

Reference parity: the CUDA pair in submodules/diff-gaussian-rasterization
(duplicateWithKeys + radix sort + renderCUDA fwd/bwd); same culling rules,
0.99 alpha clamp, 1/255 alpha floor, 1e-4 transmittance stop. The precise
tile test has no CUDA counterpart (the reference bins by bounding rect
only); it is an exact-output optimization, not a behavior change.
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

# Profiling aid (scripts/prof_step.py): comma list in W3_PROF_SKIP of
# backward stages to stub out ("bwdkernel", "redsort", "segsum") so their
# cost is attributable by difference. NEVER set in real runs.
import os as _os

_PROF_SKIP = tuple(
    s for s in _os.environ.get("W3_PROF_SKIP", "").split(",") if s)


def _tri_mode() -> str:
    """W3_TRI_MODE selects how the per-pixel cumulative log-transmittance
    (prefix sums along the 128-entry chunk axis) is computed in the
    compositing kernels:
      "f32"  — (P, CHUNK) @ upper-triangular-ones CHUNK^2 matmul in f32
               (exact, but f32 MXU matmuls are multi-pass);
      "bf16" — same matmul with bf16 inputs / f32 accumulate (1 MXU pass,
               ~0.4% rel error on each log1p(-alpha) term — the backward
               replay uses the same mode so fwd/bwd stay self-consistent);
      "scan" — log2(CHUNK) lane roll-and-add doubling scan on the VPU
               (f32-exact up to summation order, no MXU use).
    Part of the kernel build key (read when a kernel is built)."""
    return _os.environ.get("W3_TRI_MODE", "f32")


def _lane_prefix(x: jnp.ndarray, tri: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Per-row inclusive prefix sums along the lane (chunk) axis.

    x: (P, CHUNK) f32. Returns (P, CHUNK) f32 with out[:, j] =
    sum_{k<=j} x[:, k], computed per `mode` (see _tri_mode)."""
    if mode == "bf16":
        return jnp.dot(x.astype(jnp.bfloat16), tri.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    if mode == "scan":
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        s = x
        sh = 1
        while sh < x.shape[1]:
            s = s + jnp.where(lane >= sh, pltpu.roll(s, sh, 1), 0.0)
            sh *= 2
        return s
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _pack_payload_enabled() -> bool:
    """W3_PACK_PAYLOAD=1 packs the non-coordinate entry-sort payload columns
    (conic a/b/c, opacity, depth, colors) as bf16 PAIRS — one uint32 sort
    operand per two columns — mirroring what the backward reduction sort
    already does to the entry gradients (see comp_bwd). The screen-space
    center (x, y) stays exact f32 (bf16's 8-bit mantissa is ±4 px at
    x ~ 1600). Sort cost scales with operand count x bandwidth, so this
    cuts the phase-1 sort roughly 40% (11 -> 7 operands at c = 3).

    Numerics: the packed columns round to bf16 (~0.4% relative) BEFORE
    compositing; forward and backward replay from the same rounded stream,
    so gradients stay self-consistent. Rendered color moves ~1e-3 absolute
    (tests pin >= 40 dB agreement vs the unpacked path); NOT bit-exact vs
    the XLA backend, so golden-parity tests run unpacked. Read at trace
    time (part of the jit cache key via the traced graph)."""
    return _os.environ.get("W3_PACK_PAYLOAD", "0") != "0"


def _pack_cols(mt: jnp.ndarray, ncols: int) -> tuple:
    """Sort-operand packing of mt's first `ncols` (E,)-rows per
    _pack_payload_enabled: [x f32, y f32, then bf16 pairs (2,3), (4,5), ...]
    (an odd tail column pairs with zero). All operands uint32 (integer
    payload operands get float0 cotangents under custom_vjp)."""
    ops = [jax.lax.bitcast_convert_type(mt[0], jnp.uint32),
           jax.lax.bitcast_convert_type(mt[1], jnp.uint32)]
    for i in range(2, ncols, 2):
        lo = jax.lax.bitcast_convert_type(
            mt[i].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        if i + 1 < ncols:
            hi = jax.lax.bitcast_convert_type(
                mt[i + 1].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        else:
            hi = jnp.zeros_like(lo)
        ops.append(lo | (hi << 16))
    return tuple(ops)


def _unpack_cols(spay: tuple, ncols: int) -> tuple:
    """Inverse of _pack_cols on the sorted uint32 operands -> ncols f32
    (E,) rows."""
    cols = [jax.lax.bitcast_convert_type(spay[0], jnp.float32),
            jax.lax.bitcast_convert_type(spay[1], jnp.float32)]
    for w in spay[2:]:
        cols.append(jax.lax.bitcast_convert_type(
            (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16).astype(
                jnp.float32))
        cols.append(jax.lax.bitcast_convert_type(
            (w >> 16).astype(jnp.uint16), jnp.bfloat16).astype(jnp.float32))
    return tuple(cols[:ncols])


def _moment_kernels_enabled() -> bool:
    """WHEAT3DGS_MOMENT_KERNELS=1 rebuilds the compositing kernels with the
    MXU moment-form matmuls instead of the direct VPU pixel-polynomial +
    per-row reductions — same math, different schedule. The on-chip A/B
    (2026-08-18, v5e, bench scene @103k splats) measured the VPU variant
    faster: 17.9 vs 15.6 train it/s and 49.0 vs 40.3 render FPS — the
    f32-HIGHEST moment matmuls cost more MXU passes than the polynomial
    costs VPU lanes — so the VPU form is the default. Read when a kernel
    variant is built; the variant is part of the build cache key, but
    flipping the env mid-process only affects shapes not yet jitted (use
    jax.clear_caches() in tests)."""
    return _os.environ.get("WHEAT3DGS_MOMENT_KERNELS", "0") != "0"


def _alloc_entries(packed: jnp.ndarray, splats: Splats2D, width: int,
                   height: int, tile: int, budget: int,
                   max_span: int = 1024, interpret: bool = False,
                   extra_cols: Optional[tuple] = None,
                   pack_payload: Optional[bool] = None):
    """Exact-entry allocation + precise-cull sort keys (non-differentiable).

    Access-pattern discipline (all measured on-chip): TPU sorts and
    sorted-index row gathers are cheap; random-index and scalar gathers at
    entry scale are 5-20x slower. So the allocation works in DEPTH-RANK
    space — splats are permuted to front-to-back order once at N scale,
    making the slot->owner index double as the depth rank (it rides the
    sort key's low bits; no owner payload, no post-sort owner gather), and
    the ONLY entry-scale gather is one row gather of a fused
    meta+feature matrix at the monotone `owner` index.

    Layout: each visible splat gets exactly its (capped) covered-rect area
    of slots inside a static `budget`-sized slot array via exclusive-cumsum
    offsets; slot -> owner via scatter-max + running max. Slots whose tile
    the splat's ellipse cannot touch above the 1/255 alpha floor (exact
    min of the conic quadratic over the tile's pixel box) are retired to
    the sentinel tile, as are out-of-count slots and the allocation tail.

    Returns (keys, payload, order, seg_end, total, alive):
      keys:    sort-key operands — a single packed uint32
               (tile << rank_bits | depth_rank), or the (tile, rank) pair
               when tile+rank bits overflow 32 on huge scenes;
      payload: tuple of 7+c (budget,) feature columns
               (x, y, conic a/b/c, opacity, depth, colors...) BITCAST to
               uint32 — they ride the entry sort as payload operands, and
               integer operands get float0 cotangents under custom_vjp so
               no zero-arithmetic backward graph is built for them
               (measured ~10 ms/step of pure zero propagation otherwise);
      order:   (N,) int32 depth permutation (rank -> original index);
      seg_end: (N,) int32 — rank r's segment END position in any
               owner-grouped ordering of the slot array (= clip of the
               inclusive count cumsum to the budget). Computed here at N
               scale because recovering it later via searchsorted costs an
               E-scale binary-search gather chain (measured 18.7 ms in the
               backward);
      total:   scalar int32 allocation demand (sum of covered-rect
               areas) — demand > budget means tail entries were cropped
               this call (overflow telemetry);
      alive:   scalar int32 surviving entry count after the precise cull.
    """
    n = splats.xy.shape[0]
    c = packed.shape[1] - 8
    # Payload columns carried through the entry sort beyond the 6 geometry
    # columns (x, y, conic a/b/c, opacity): packed-column indices. Default =
    # depth + all colors (the training layout). Forward-only callers pass a
    # subset (e.g. () for alpha-only) — the sort cost scales with it.
    if extra_cols is None:
        extra_cols = (6,) + tuple(range(8, 8 + c))
    nv = len(extra_cols)
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    e = budget

    from .binning import capped_rect

    cap = min(max_span, 1 << 14)
    assert n * cap < 2**31, "int32 allocation-offset overflow"
    assert e < 1 << 24, "entry budget exceeds exact-f32 offset range"
    rx, ry, sx, _, count = capped_rect(splats, tiles_x, tiles_y, tile, cap)

    # Alpha floor in conic-quadratic units: alpha = o*exp(-q/2) >= 1/255
    # iff q <= 2*log(255*o) (renderCUDA's min-alpha skip, exactly).
    q_max = 2.0 * jnp.log(jnp.maximum(splats.opacity, 1e-12) * 255.0)

    # Fused per-splat meta + features, ONE matrix so the entry-scale
    # expansion is a single row gather. Integer fields as f32 (exact below
    # 2^24). Feature cols skip packed's pad col 7.
    premeta = jnp.concatenate([
        packed[:, :6],                                # geometry cols
        packed[:, list(extra_cols)] if nv else
        jnp.zeros((n, 0), jnp.float32),               # value payload cols
        jnp.maximum(sx, 1).astype(jnp.float32)[:, None],
        rx.astype(jnp.float32)[:, None],
        ry.astype(jnp.float32)[:, None],
        q_max[:, None],
    ], axis=1)                                        # (N, 10+nv)
    i_sx, i_rx, i_ry, i_q = (6 + nv, 7 + nv, 8 + nv, 9 + nv)

    # Depth-rank space: permute splats front-to-back (one N-scale row
    # gather), then allocate in rank order so owner == depth rank.
    order = jnp.argsort(splats.depth, stable=True)    # rank -> original
    premeta_r = premeta[order]
    count_r = count[order]
    offs_r = jnp.cumsum(count_r) - count_r            # exclusive
    total = offs_r[-1] + count_r[-1]

    # Slot ownership: rank r marks its first slot; running max fills its
    # range. Zero-count ranks place no mark, so ties at one offset resolve
    # to the single non-empty owner (the largest rank there).
    scat = jnp.where(count_r > 0, offs_r, e)
    mark = jnp.zeros((e,), jnp.int32).at[scat].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    owner = jax.lax.cummax(mark)

    # ONE row gather at the monotone owner index, then ONE layout change
    # to lane-major: a (E, 10+c) row-major array lane-pads its 13-wide
    # minor dim to 128 on TPU, so every later column read would stream ~10x
    # the bytes — all decode/cull math below runs on dense (E,) rows of
    # the transposed matrix instead. The optimization barrier pins the
    # transposed copy as a single materialization: without it XLA re-fuses
    # gather+transpose into every consumer and re-reads the padded layout
    # once per column.
    mt = jax.lax.optimization_barrier(
        premeta_r[owner].T)                           # (10+nv, E) lane-major

    if pack_payload is None:
        pack_payload = _pack_payload_enabled()
    if pack_payload:
        payload = _pack_cols(mt, 6 + nv)
    else:
        payload = tuple(
            jax.lax.bitcast_convert_type(mt[f], jnp.uint32)
            for f in range(6 + nv))
    # Rank r's EXACT slot multiplicity: a marking rank owns every slot up
    # to the next marking rank's offset (cummax ownership), so the last
    # marking rank also owns the allocation tail — a plain count cumsum
    # would misattribute its (unstably sorted) real entries. All N-scale.
    marking = (count_r > 0) & (offs_r < e)
    offs_m = jnp.where(marking, offs_r, e)
    nxt = jnp.concatenate(
        [offs_m[1:], jnp.full((1,), e, offs_m.dtype)])
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(nxt)))
    mult = jnp.where(marking, nxt - jnp.minimum(offs_r, e), 0)
    seg_end = jnp.cumsum(mult).astype(jnp.int32)
    rank_bits = _rank_bits(t_total)

    if n <= (1 << rank_bits):
        # Fused decode + precise cull + key build (single Pallas pass; the
        # unfused XLA chain materialized ~30 E-scale intermediates,
        # measured ~8 ms at E ~ 1M).
        key, alive = _decode_cull_pallas(
            mt, owner, total, tiles_x, tile, t_total, rank_bits,
            i_sx, i_rx, i_ry, i_q, interpret)
        return (key,), payload, order, seg_end, total, alive

    # Huge-scene (tile, rank) two-key fallback: XLA decode.
    sx_o = jnp.maximum(mt[i_sx].astype(jnp.int32), 1)
    rx_o = mt[i_rx].astype(jnp.int32)
    ry_o = mt[i_ry].astype(jnp.int32)
    idx = jnp.arange(e, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), owner[:-1]])
    first = jax.lax.cummax(jnp.where(owner != prev, idx, 0))
    j = idx - first
    valid = idx < total
    jc = jnp.minimum(j, 1 << 22)
    q = jnp.floor(jc.astype(jnp.float32)
                  * (1.0 / sx_o.astype(jnp.float32))).astype(jnp.int32)
    r = jc - q * sx_o
    q = q + (r >= sx_o).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    dy = q
    dx = jc - q * sx_o
    txi = rx_o + dx
    tyi = ry_o + dy
    tile_id = tyi * tiles_x + txi
    x0 = (txi * tile).astype(jnp.float32) - mt[0]
    x1 = x0 + (tile - 1)
    y0 = (tyi * tile).astype(jnp.float32) - mt[1]
    y1 = y0 + (tile - 1)
    ca, cb, cc = mt[2], mt[3], mt[4]

    def _edge(d_fix, lo, hi, c_fix, c_free):
        t = jnp.clip(-cb * d_fix / c_free, lo, hi)
        return c_fix * d_fix * d_fix + 2.0 * cb * d_fix * t + c_free * t * t

    inside = (x0 <= 0) & (x1 >= 0) & (y0 <= 0) & (y1 >= 0)
    qmin = jnp.minimum(
        jnp.minimum(_edge(x0, y0, y1, ca, cc), _edge(x1, y0, y1, ca, cc)),
        jnp.minimum(_edge(y0, x0, x1, cc, ca), _edge(y1, x0, x1, cc, ca)))
    qmin = jnp.where(inside, 0.0, qmin)
    alive_mask = valid & (qmin <= mt[i_q] + 1e-3)
    tile_out = jnp.where(alive_mask, tile_id, t_total)
    alive = alive_mask.sum(dtype=jnp.int32)
    return (tile_out, owner), payload, order, seg_end, total, alive


def _rank_bits(t_total: int) -> int:
    return 32 - max(1, math.ceil(math.log2(t_total + 1)))


D_CHK = 512         # slots per decode/cull kernel chunk


def _decode_kernel(tiles_x: int, tile: int, t_total: int, rank_bits: int,
                   i_sx: int, i_rx: int, i_ry: int, i_q: int):
    """Slot decode + precise ellipse/tile cull + sort-key build, fused.

    The same math as the XLA formulation in _alloc_entries, but ONE pass
    over the (rows, E) meta matrix instead of ~30 unfused E-scale
    elementwise ops (measured ~8 ms of intermediate materialization at
    E ~ 1M). Sequential grid; SMEM carries the previous chunk's last owner
    and run-start so runs crossing chunk boundaries decode correctly.
    """

    def kernel(total_ref, mt_ref, owner_ref, key_ref, alive_ref, scal):
        k = pl.program_id(0)
        n_prog = pl.num_programs(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, D_CHK), 1)

        @pl.when(k == 0)
        def _():
            scal[0] = -1          # previous chunk's last owner
            scal[1] = 0           # previous chunk's last run start
            scal[2] = 0           # alive accumulator

        owner = owner_ref[...]                         # (1, D_CHK) int32
        idx = k * D_CHK + lane
        prev = jnp.where(lane == 0, scal[0], pltpu.roll(owner, 1, 1))
        cand = jnp.where(owner != prev, idx, -1)
        s = cand
        sh = 1
        while sh < D_CHK:
            s = jnp.maximum(s, jnp.where(lane >= sh,
                                         pltpu.roll(s, sh, 1), -1))
            sh *= 2
        first = jnp.maximum(s, scal[1])                # run starts
        scal[0] = jnp.max(owner)                       # owner is monotone
        scal[1] = jnp.max(first)

        total = total_ref[0]
        valid = idx < total
        j = jnp.minimum(idx - first, 1 << 22)
        sx = jnp.maximum(mt_ref[i_sx:i_sx + 1, :].astype(jnp.int32), 1)
        q = jnp.floor(j.astype(jnp.float32)
                      * (1.0 / sx.astype(jnp.float32))).astype(jnp.int32)
        r = j - q * sx
        q = q + (r >= sx).astype(jnp.int32) - (r < 0).astype(jnp.int32)
        dy = q
        dx = j - q * sx
        txi = mt_ref[i_rx:i_rx + 1, :].astype(jnp.int32) + dx
        tyi = mt_ref[i_ry:i_ry + 1, :].astype(jnp.int32) + dy
        tile_id = tyi * tiles_x + txi

        x0 = (txi * tile).astype(jnp.float32) - mt_ref[0:1, :]
        x1 = x0 + (tile - 1)
        y0 = (tyi * tile).astype(jnp.float32) - mt_ref[1:2, :]
        y1 = y0 + (tile - 1)
        ca = mt_ref[2:3, :]
        cb = mt_ref[3:4, :]
        cc = mt_ref[4:5, :]

        def edge(d_fix, lo, hi, c_fix, c_free):
            t = jnp.clip(-cb * d_fix / c_free, lo, hi)
            return (c_fix * d_fix * d_fix + 2.0 * cb * d_fix * t
                    + c_free * t * t)

        inside = (x0 <= 0) & (x1 >= 0) & (y0 <= 0) & (y1 >= 0)
        qmin = jnp.minimum(
            jnp.minimum(edge(x0, y0, y1, ca, cc), edge(x1, y0, y1, ca, cc)),
            jnp.minimum(edge(y0, x0, x1, cc, ca), edge(y1, x0, x1, cc, ca)))
        qmin = jnp.where(inside, 0.0, qmin)
        mask = valid & (qmin <= mt_ref[i_q:i_q + 1, :] + 1e-3)

        tile_out = jnp.where(mask, tile_id, t_total)
        key_ref[...] = ((tile_out.astype(jnp.uint32) << rank_bits)
                        | owner.astype(jnp.uint32))
        scal[2] = scal[2] + jnp.sum(mask.astype(jnp.int32))
        # (1,1) vector store: Mosaic rejects scalar stores to VMEM.
        alive_ref[...] = jnp.full((1, 1), scal[2], jnp.int32)
        del n_prog

    return kernel


def _decode_cull_pallas(mt: jnp.ndarray, owner: jnp.ndarray,
                        total: jnp.ndarray, tiles_x: int, tile: int,
                        t_total: int, rank_bits: int, i_sx: int, i_rx: int,
                        i_ry: int, i_q: int, interpret: bool):
    """(rows, E) meta + monotone owner -> (packed key (E,), alive count)."""
    rows, e = mt.shape
    e_pad = -(-e // D_CHK) * D_CHK
    r_pad = -(-rows // 8) * 8
    if e_pad > e or r_pad > rows:
        mt = jnp.pad(mt, ((0, r_pad - rows), (0, e_pad - e)))
        owner = jnp.pad(owner, (0, e_pad - e))
    n_blocks = e_pad // D_CHK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((r_pad, D_CHK), lambda k, *_: (0, k),
                         memory_space=pltpu.VMEM),     # meta columns
            pl.BlockSpec((1, D_CHK), lambda k, *_: (0, k),
                         memory_space=pltpu.VMEM),     # owner
        ],
        out_specs=[
            pl.BlockSpec((1, D_CHK), lambda k, *_: (0, k),
                         memory_space=pltpu.VMEM),     # keys
            pl.BlockSpec((1, 1), lambda k, *_: (0, 0),
                         memory_space=pltpu.VMEM),     # alive
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
    )
    key, alive = pl.pallas_call(
        _decode_kernel(tiles_x, tile, t_total, rank_bits,
                       i_sx, i_rx, i_ry, i_q),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, e_pad), jnp.uint32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)],
        interpret=interpret,
    )(total.astype(jnp.int32).reshape(1), mt,
      owner.reshape(1, e_pad))
    return key[0, :e], alive[0, 0]


R_BLK = 512         # ranks reduced per segsum grid step
S_CHK = 512         # value slots per segsum DMA chunk


def _segsum_kernel():
    """Contiguous-segment sum via per-chunk mask matmuls (MXU).

    Input: a (R, E) lane-major value table whose rows are grouped by
    owning rank (the reduction sort's output), and per-rank segment bounds.
    Grid step k reduces ranks [R_BLK*k, R_BLK*(k+1)): it walks the bound
    slots in S_CHK-wide chunks and accumulates  acc += M @ chunk^T  where
    M[r, s] = (start_r <= slot_s < end_r) — a (R_BLK, S_CHK) 0/1 matrix
    built by broadcast compares. One matmul per chunk replaces any scatter
    or E-scale scan: TPU scatters at this scale measured 10-100x slower,
    and a lane-padded (E, R) cumsum moves ~10x the bytes. Blocks are sized
    so each grid step walks ~20 chunks — small-DMA latency pipelines away
    (at 128-wide blocks the walk was ~6 tiny DMAs and ran latency-bound).
    """

    def kernel(blk_lo_ref, blk_hi_ref, starts_ref, ends_ref, vals_hbm,
               out_ref, buf, sem):
        k = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S_CHK), 1)
        s0 = blk_lo_ref[k]
        e_last = blk_hi_ref[k]
        a = (s0 // S_CHK) * S_CHK
        nc = jnp.where(e_last > s0, pl.cdiv(e_last - a, S_CHK), 0)
        starts_col = starts_ref[0, 0].reshape(R_BLK, 1)
        ends_col = ends_ref[0, 0].reshape(R_BLK, 1)

        def dma(slot, j):
            return pltpu.make_async_copy(
                vals_hbm.at[:, pl.ds(
                    pl.multiple_of(a + j * S_CHK, S_CHK), S_CHK)],
                buf.at[slot], sem.at[slot])

        @pl.when(nc > 0)
        def _():
            dma(0, 0).start()

        def body(j, acc):
            slot = j % 2

            @pl.when(j + 1 < nc)
            def _():
                dma(1 - slot, j + 1).start()

            dma(slot, j).wait()
            g = a + j * S_CHK + lane                       # (1, S_CHK)
            m = ((g >= starts_col) & (g < ends_col)).astype(jnp.float32)
            return acc + jax.lax.dot_general(
                m, buf[slot], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (R_BLK, FEAT)

        out_ref[...] = jax.lax.fori_loop(
            0, nc, body, jnp.zeros((R_BLK, FEAT), jnp.float32))

    return kernel


def _segment_sum_sorted(vals_lane: jnp.ndarray, seg_end: jnp.ndarray,
                        n_rows: int, interpret: bool) -> jnp.ndarray:
    """(R<=FEAT, E) rank-grouped values + per-rank segment ends -> (N, R)
    per-rank sums. seg_end must be nondecreasing with seg_end[-1] <= E."""
    r, e = vals_lane.shape
    pads = []
    if r < FEAT:
        pads.append(((0, FEAT - r), (0, 0)))
    e_pad = -(-e // S_CHK) * S_CHK
    if e_pad > e:
        pads.append(((0, 0), (0, e_pad - e)))
    if pads:
        vals_lane = jnp.pad(vals_lane, (
            (0, FEAT - r), (0, e_pad - e)))
    n_pad = -(-n_rows // R_BLK) * R_BLK
    seg_end = jnp.concatenate([
        seg_end.astype(jnp.int32),
        jnp.broadcast_to(seg_end[-1].astype(jnp.int32),
                         (n_pad - n_rows,))])
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), seg_end[:-1]])
    # Padded ranks repeat the last end => start == end, empty mask rows.
    n_blocks = n_pad // R_BLK
    blk_lo = seg_start[::R_BLK]                       # (n_blocks,)
    blk_hi = seg_end[R_BLK - 1::R_BLK]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            # (n_blocks, 1, R_BLK): the unit middle dim satisfies the
            # Mosaic block rule (last two dims must be full or (8k, 128k)).
            pl.BlockSpec((1, 1, R_BLK), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),     # starts
            pl.BlockSpec((1, 1, R_BLK), lambda k, *_: (k, 0, 0),
                         memory_space=pltpu.VMEM),     # ends
            pl.BlockSpec(memory_space=pl.ANY),      # values
        ],
        out_specs=pl.BlockSpec((R_BLK, FEAT), lambda k, *_: (k, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEAT, S_CHK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _segsum_kernel(),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, FEAT), jnp.float32),
        interpret=interpret,
    )(blk_lo, blk_hi, seg_start.reshape(n_blocks, 1, R_BLK),
      seg_end.reshape(n_blocks, 1, R_BLK), vals_lane)
    return out[:n_rows, :r]


def _sorted_stream(keys, payload, t_total: int, c: int):
    """Budget-sized sorted entry stream.

    ONE variadic sort carries the 7+c feature columns as payload — cheaper
    on TPU than a post-sort gather at the (random) sorted positions. The
    owning depth rank travels in the key's low bits (or as the second key
    on huge scenes), so no index payload is needed at all. Live entries
    sort before the sentinel tail and are walked via per-tile segment
    bounds; the tail is never touched by any segment.

    Returns (entries_lane (FEAT, E) lane-major, starts (T,), ends (T,),
    sowner (E,) — owning depth rank per sorted entry, the backward
    reduction's segment key).
    """
    nk = len(keys)
    sorted_ = jax.lax.sort(keys + payload, num_keys=nk, is_stable=False)
    if nk == 1:
        rb = _rank_bits(t_total)
        stile = (sorted_[0] >> rb).astype(jnp.int32)
        sowner = (sorted_[0] & ((1 << rb) - 1)).astype(jnp.int32)
    else:  # huge scenes: (tile, rank) two-key fallback
        stile, sowner = sorted_[0], sorted_[1]
    # Payload columns travel bitcast as uint32 (integer operands are
    # gradient-transparent under the custom_vjp); recover f32 views here.
    # A payload tuple shorter than its 7+c columns is bf16-pair-packed
    # (see _pack_cols); the static tuple length disambiguates exactly.
    if len(payload) < 7 + c:
        spay = _unpack_cols(sorted_[nk:], 7 + c)
    else:
        spay = tuple(jax.lax.bitcast_convert_type(p, jnp.float32)
                     for p in sorted_[nk:])

    tids = jnp.arange(t_total, dtype=stile.dtype)
    starts = jnp.searchsorted(stile, tids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(stile, tids, side="right").astype(jnp.int32)

    zeros = jnp.zeros_like(spay[0])
    rows = (list(spay[:7]) + [zeros] + list(spay[7:7 + c])
            + [zeros] * (FEAT - 8 - c))
    entries_lane = jnp.stack(rows)                    # (FEAT, E)
    return entries_lane, starts, ends, sowner


def _poly_matrix(pix_i: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(6, P) pixel-moment matrix in TILE-LOCAL coords [1, lx, ly, lx^2,
    lx*ly, ly^2] — identical for every tile, 32 KB of VMEM at P = 1024.

    Both kernels are VPU-bound; this matrix moves their per-(P, CHUNK)
    pixel-polynomial work onto the MXU:
    - forward/backward: the conic quadratic power(p, e) is a degree-2
      polynomial in (lx, ly), so it is ONE polyT @ C(6, CHUNK) matmul with
      per-entry coefficients (vs ~7 VPU ops per pixel-entry for dx/dy/
      power);
    - backward: the six geometry gradient rows are sums of
      dpow * polynomial(dx, dy) = re-centered moments of dpow against
      these same six rows (vs ~15 VPU products + 6 large reductions).
    HIGHEST-precision matmuls: lx^2 <= 961 is not bf16-exact.
    """
    p = pix_i.shape[0]
    lx = (pix_i % tile).astype(jnp.float32)               # (P, 1)
    ly = (pix_i // tile).astype(jnp.float32)
    return jnp.concatenate(
        [jnp.ones((p, 1), jnp.float32), lx, ly, lx * lx, lx * ly, ly * ly],
        axis=1).T


def _power_matmul(poly: jnp.ndarray, ent: jnp.ndarray, tx, ty):
    """Conic quadratic power = -0.5(a dx^2 + c dy^2) - b dx dy for every
    (pixel, entry) pair as polyT(P, 6) @ C(6, CHUNK), with the coefficient
    rows built at (1, CHUNK) scale from the entry features."""
    xe = ent[0:1, :] - jnp.float32(tx)                    # tile-local center
    ye = ent[1:2, :] - jnp.float32(ty)
    ca, cb, cc = ent[2:3, :], ent[3:4, :], ent[4:5, :]
    coef = jnp.concatenate([
        -0.5 * (ca * xe * xe + cc * ye * ye) - cb * xe * ye,
        ca * xe + cb * ye,
        cc * ye + cb * xe,
        -0.5 * ca,
        -cb,
        -0.5 * cc,
    ], axis=0)                                            # (6, CHUNK)
    return jax.lax.dot_general(
        poly, coef, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (P, CHUNK)


def _fwd_kernel(tiles_x: int, tile: int, t_total: int, r_batch: int,
                moment: bool = True, tri_mode: str = "f32"):
    """r_batch tiles per grid step (inner fori): grid-step overhead is a
    few microseconds on TPU and dominates sparse tiles, so flattening 8
    tiles into one step amortizes it 8x. All DMA logic is sequential across
    the flattened walk exactly as it was across grid steps."""
    p = tile * tile

    def kernel(starts_ref, ends_ref, lane_hbm, out_ref, lane_buf, sem_l,
               slot_ref):
        pid = pl.program_id(0)
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
        poly = _poly_matrix(pix_i, tile) if moment else None  # (6, P) const

        def dma(slot, off):
            return pltpu.make_async_copy(
                lane_hbm.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
                lane_buf.at[slot], sem_l.at[slot])

        def one_tile(r, _):
            t = pid * r_batch + r
            s = starts_ref[t]
            e = ends_ref[t]
            a = (s // CHUNK) * CHUNK          # aligned walk floor
            nc = jnp.where(e > s, pl.cdiv(e - a, CHUNK), 0)

            # Cross-tile software pipeline: tile t's FIRST chunk is started
            # at the end of tile t-1 (parity in slot_ref[0]); most tiles
            # have one chunk, so the DMA latency hides behind the previous
            # tile's compute and output write. Within-tile extra chunks run
            # on the opposite slot, so an early transmittance exit can never
            # leave a DMA un-awaited.
            @pl.when(t == 0)
            def _():
                slot_ref[0] = 0

                @pl.when(nc > 0)
                def _():
                    dma(0, a).start()

            s0 = slot_ref[0]

            tx = (t % tiles_x) * tile
            ty = (t // tiles_x) * tile
            if not moment:
                px = (tx + pix_i % tile).astype(jnp.float32)  # (P, 1)
                py = (ty + pix_i // tile).astype(jnp.float32)

            def chunk_body(carry):
                j, logt, ws, acc = carry
                slot = (s0 + j) % 2

                @pl.when(j > 0)
                def _():
                    dma(slot, a + j * CHUNK).start()

                dma(slot, a + j * CHUNK).wait()
                ent = lane_buf[slot]                          # (FEAT, CHUNK)
                g = a + j * CHUNK + lane                      # global entry
                valid = (g >= s) & (g < e)                    # (1, CHUNK)

                if moment:
                    power = _power_matmul(poly, ent, tx, ty)  # (P, CHUNK)
                else:
                    dx = px - ent[0:1, :]                     # (P, CHUNK)
                    dy = py - ent[1:2, :]
                    power = (-0.5 * (ent[2:3, :] * dx * dx
                                     + ent[4:5, :] * dy * dy)
                             - ent[3:4, :] * dx * dy)
                alpha = jnp.minimum(ALPHA_MAX,
                                    ent[5:6, :] * jnp.exp(power))
                alpha = jnp.where(
                    (power > 0.0) | (alpha < ALPHA_MIN) | ~valid, 0.0, alpha)

                l1m = jnp.log1p(-alpha)                       # (P, CHUNK)
                log_t_after = logt + _lane_prefix(l1m, tri, tri_mode)
                include = log_t_after >= LOG_T_EPS
                w = jnp.where(include,
                              alpha * jnp.exp(log_t_after - l1m), 0.0)

                # Channel-major accumulators (FEAT, P) and (1, P): the
                # reversed contraction gives accT directly, and the weight
                # total telescopes to the final transmittance
                # (sum_k a_k T_b_k = 1 - T_after_last_included), so no
                # in-kernel transposes and the output block keeps P on the
                # lane axis (a (.., P, 17) block would lane-pad 17 -> 128
                # and blow the 16 MB VMEM budget at r_batch = 8).
                acc = acc + jax.lax.dot_general(
                    ent, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (FEAT, P)
                ws = ws + jax.lax.dot_general(
                    jnp.ones((1, CHUNK), jnp.float32), w,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (1, P)
                return j + 1, log_t_after[:, CHUNK - 1:CHUNK], ws, acc

            def cond(carry):
                j, logt, _, _ = carry
                return (j < nc) & (jnp.max(logt) >= LOG_T_EPS)

            init = (jnp.int32(0), jnp.zeros((p, 1), jnp.float32),
                    jnp.zeros((1, p), jnp.float32),
                    jnp.zeros((FEAT, p), jnp.float32))
            _, _, ws, acc = jax.lax.while_loop(cond, chunk_body, init)

            # Start the next tile's first chunk (flip parity when issued).
            @pl.when(t + 1 < t_total)
            def _():
                s_n = starts_ref[t + 1]

                @pl.when(ends_ref[t + 1] > s_n)
                def _():
                    dma(1 - s0, (s_n // CHUNK) * CHUNK).start()
                    slot_ref[0] = 1 - s0

            # Emit the FULL feature accumulator + final transmittance: the
            # backward recovers its suffix total A = g . acc exactly from
            # this (no replay pass), and the caller assembles color/depth/
            # alpha (background applied outside the kernel, differentiably).
            out_ref[r, 0:FEAT, :] = acc
            out_ref[r, FEAT:FEAT + 1, :] = 1.0 - ws
            return 0

        def guarded(r, _):
            @pl.when(pid * r_batch + r < t_total)
            def _():
                one_tile(r, None)
            return 0

        jax.lax.fori_loop(0, r_batch, guarded, 0)

    return kernel


def _bwd_kernel(tiles_x: int, tile: int, t_total: int, r_batch: int,
                moment: bool = True, tri_mode: str = "f32"):
    """Gradient replay: one front-to-back pass per tile.

    The cotangent g arrives in the RAW output layout (acc FEAT cols +
    t_final), so its first FEAT columns ARE the per-feature weight
    gradients, and the suffix machinery reduces to:
        u_k      = dL/dw_k = g[:, :FEAT] . e_k
        dL/da_k  = T_b_k u_k - (A - prefix_k)/(1-a_k) - c2/(1-a_k)
    where A = g . acc (computed exactly in XLA from the stored forward
    accumulator — no replay pass) and c2 = g_tfinal * t_final is the
    final-transmittance chain.

    Entry gradients land at the entries' sorted positions. A chunk shared
    by two (or more) tile segments is combined through an in-VMEM carry:
    the sequential walk visits tiles in segment order, so when tile t's
    first chunk is the same 128-entry window as the previous tile's last,
    the previous partial is still in the carry slot and is added before
    the store — no atomics, no HBM read-modify-write.

    Output DMAs are double-buffered: a slot's previous store is only waited
    when the slot is reused (or when a boundary merge writes the same HBM
    window again, which needs write-after-write ordering). The replay stops
    at the same transmittance floor as the forward (entries past it have
    zero weight AND zero gradient); their rows are never written — the
    output aliases a zero-filled buffer, so skipped rows already hold the
    correct zero gradient.
    """
    p = tile * tile

    def kernel(starts_ref, ends_ref, lane_hbm, g_ref, a_ref, dzero_ref,
               out_hbm, lane_buf, out_bufs, sem_in, sem_out, scal):
        del dzero_ref  # aliased to out_hbm; pre-zeroed by the caller
        # scal: [0]=carry_off, [1]=carry_slot, [2]=pend0, [3]=pend1 (HBM
        # window offsets of the in-flight store per slot, -1 = idle).
        pid = pl.program_id(0)
        n_prog = pl.num_programs(0)
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
        poly = _poly_matrix(pix_i, tile) if moment else None  # (6, P) const

        @pl.when(pid == 0)
        def _():
            scal[0] = -1
            scal[1] = 0
            scal[2] = -1
            scal[3] = -1

        def out_dma(slot, off):
            return pltpu.make_async_copy(
                out_bufs.at[slot],
                out_hbm.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
                sem_out.at[slot])

        def retire(slot):
            @pl.when(scal[2 + slot] >= 0)
            def _():
                out_dma(slot, scal[2 + slot]).wait()
                scal[2 + slot] = -1

        def one_tile(r):
            t = pid * r_batch + r
            s = starts_ref[t]
            e = ends_ref[t]
            a = (s // CHUNK) * CHUNK
            nc = jnp.where(e > s, pl.cdiv(e - a, CHUNK), 0)

            tx = (t % tiles_x) * tile
            ty = (t // tiles_x) * tile
            if not moment:
                px = (tx + pix_i % tile).astype(jnp.float32)
                py = (ty + pix_i // tile).astype(jnp.float32)

            gmat = g_ref[r][0:FEAT, :]                        # (FEAT, P)
            a2_row = a_ref[r][0:1, :] + a_ref[r][1:2, :]      # (1, P) A + c2

            def in_dma(slot, j):
                return pltpu.make_async_copy(
                    lane_hbm.at[:, pl.ds(
                        pl.multiple_of(a + j * CHUNK, CHUNK), CHUNK)],
                    lane_buf.at[slot], sem_in.at[slot])

            @pl.when(nc > 0)
            def _():
                in_dma(0, 0).start()

            def chunk_body(carry):
                j, logt, prefix_carry = carry
                slot = j % 2

                @pl.when(j + 1 < nc)
                def _():
                    in_dma(1 - slot, j + 1).start()

                in_dma(slot, j).wait()
                ent = lane_buf[slot]                          # (FEAT, CHUNK)
                off = a + j * CHUNK
                g_id = off + lane
                valid = (g_id >= s) & (g_id < e)
                if moment:
                    power = _power_matmul(poly, ent, tx, ty)
                else:
                    dx = px - ent[0:1, :]
                    dy = py - ent[1:2, :]
                    power = (-0.5 * (ent[2:3, :] * dx * dx
                                     + ent[4:5, :] * dy * dy)
                             - ent[3:4, :] * dx * dy)
                ep = jnp.exp(power)
                raw = ent[5:6, :] * ep
                alpha = jnp.minimum(ALPHA_MAX, raw)
                live = (power <= 0.0) & (alpha >= ALPHA_MIN) & valid
                alpha = jnp.where(live, alpha, 0.0)
                l1m = jnp.log1p(-alpha)
                log_t_after = logt + _lane_prefix(l1m, tri, tri_mode)
                include = log_t_after >= LOG_T_EPS
                t_before = jnp.exp(log_t_after - l1m)
                w = jnp.where(include, alpha * t_before, 0.0)
                # Gradient-side matmuls run in bf16 (f32 accumulate):
                # ~3x MXU rate; the ~0.4% rounding is the same order as the
                # bf16 packing the reduction already applies, and the
                # 2%-tolerance backend gradient-parity tests bound both.
                # The transmittance REPLAY scan above stays f32 so the
                # include/weight masks match the forward exactly.
                u = jax.lax.dot_general(
                    gmat.astype(jnp.bfloat16), ent.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (P, CHUNK)

                pu = w * u
                prefix = prefix_carry + jnp.dot(
                    pu.astype(jnp.bfloat16), tri.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
                # (A + c2) broadcast to (P, CHUNK) via a rank-1 outer
                # product on the MXU (no in-kernel transpose of the
                # channel-major aux rows).
                a2 = jax.lax.dot_general(
                    a2_row, jnp.ones((1, CHUNK), jnp.float32),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (P, CHUNK)
                grad_ok = live & include & (raw < ALPHA_MAX)
                dalpha = jnp.where(
                    grad_ok,
                    t_before * u - (a2 - prefix) / (1.0 - alpha), 0.0)
                dpow = dalpha * alpha                          # (P, CHUNK)

                # Per-entry reductions over pixels (rows = FEAT layout).
                fg = jax.lax.dot_general(
                    gmat.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (FEAT,CHUNK)
                a_, b_, c_ = ent[2:3, :], ent[3:4, :], ent[4:5, :]
                if moment:
                    # Moment form of the geometry rows (see `poly` above).
                    # The entry center in tile-local coords (xe, ye)
                    # re-centers the raw moments; everything below the
                    # matmul is (1, CHUNK).
                    mom = jax.lax.dot_general(
                        poly, dpow, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)   # (6, CHUNK)
                    xe = ent[0:1, :] - jnp.float32(tx)
                    ye = ent[1:2, :] - jnp.float32(ty)
                    s0 = mom[0:1, :]
                    e1x = mom[1:2, :] - xe * s0      # sum dpow * dx
                    e1y = mom[2:3, :] - ye * s0      # sum dpow * dy
                    exx = mom[3:4, :] - xe * (2.0 * mom[1:2, :] - xe * s0)
                    exy = (mom[4:5, :] - xe * mom[2:3, :] - ye * mom[1:2, :]
                           + xe * ye * s0)
                    eyy = mom[5:6, :] - ye * (2.0 * mom[2:3, :] - ye * s0)
                    # dL/d opacity: wherever grad_ok, alpha = o*exp(power),
                    # so dalpha*exp(power) == dpow / o exactly (o > 0 when
                    # live).
                    dop_sum = s0 / jnp.maximum(ent[5:6, :], 1e-12)
                    geo = jnp.concatenate([
                        a_ * e1x + b_ * e1y,
                        b_ * e1x + c_ * e1y,
                        -0.5 * exx,
                        -exy,
                        -0.5 * eyy,
                        dop_sum,
                    ], axis=0)                                 # (6, CHUNK)
                else:
                    dop = dalpha * ep
                    geo = jnp.concatenate([
                        jnp.sum(dpow * (a_ * dx + b_ * dy), 0,
                                keepdims=True),
                        jnp.sum(dpow * (b_ * dx + c_ * dy), 0,
                                keepdims=True),
                        jnp.sum(-0.5 * dx * dx * dpow, 0, keepdims=True),
                        jnp.sum(-dx * dy * dpow, 0, keepdims=True),
                        jnp.sum(-0.5 * dy * dy * dpow, 0, keepdims=True),
                        jnp.sum(dop, 0, keepdims=True),
                    ], axis=0)                                 # (6, CHUNK)
                # rows 0-5 of fg are zero (gmat has no geometry columns).
                block = jnp.concatenate([geo, fg[6:, :]], axis=0)

                # Boundary merge via the sequential carry: the previous
                # tile's last partial for this very window still sits in
                # out_bufs[carry_slot].
                is_merge = scal[0] == off
                cslot = scal[1]
                block = block + jnp.where(is_merge, out_bufs[cslot], 0.0)

                wslot = 1 - cslot
                # Reuse ordering: wait the slot's previous store; on a
                # merge also wait the carried slot's store of this same
                # window (write-after-write on out_hbm).
                retire(wslot)

                @pl.when(is_merge)
                def _():
                    retire(cslot)

                out_bufs[wslot] = block
                out_dma(wslot, off).start()
                scal[0] = off
                scal[1] = wslot
                scal[2 + wslot] = off
                return (j + 1, log_t_after[:, CHUNK - 1:CHUNK],
                        prefix[:, CHUNK - 1:CHUNK])

            def cond(carry):
                j, logt, _ = carry
                return (j < nc) & (jnp.max(logt) >= LOG_T_EPS)

            j_end, _, _ = jax.lax.while_loop(
                cond, chunk_body,
                (jnp.int32(0), jnp.zeros((p, 1), jnp.float32),
                 jnp.zeros((p, 1), jnp.float32)))

            # An early exit leaves the next chunk's lookahead DMA in
            # flight — retire it before the next tile reuses the slot.
            @pl.when(j_end < nc)
            def _():
                in_dma(j_end % 2, j_end).wait()

        def guarded(r, _):
            @pl.when(pid * r_batch + r < t_total)
            def _():
                one_tile(r)
            return 0

        jax.lax.fori_loop(0, r_batch, guarded, 0)

        # Retire outstanding stores before the kernel ends.
        @pl.when(pid + 1 == n_prog)
        def _():
            retire(0)
            retire(1)

    return kernel


def _fwd_only_kernel(tiles_x: int, tile: int, t_total: int, r_batch: int,
                     nv: int, moment: bool, tri_mode: str = "f32"):
    """Inference-only compositor: same walk/math as _fwd_kernel but

    - the entry table carries only 6 geometry rows + a ONES row + nv value
      rows (depth/colors as requested) — the ones row telescopes the weight
      sum into the SAME accumulator matmul, so each chunk costs ONE MXU
      contraction instead of two;
    - the output block is (r_batch, 1+nv, P): [weight-sum, values...] —
      writing 2-6 rows instead of the training kernel's 17 (the backward
      needs the full accumulator as a residual; inference does not).
    No custom_vjp, no residuals, no backward-ordering constraints.
    """
    p = tile * tile

    def kernel(starts_ref, ends_ref, lane_hbm, out_ref, lane_buf, sem_l,
               slot_ref):
        pid = pl.program_id(0)
        feat_k = lane_buf.shape[1]
        pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        tri = jnp.triu(jnp.ones((CHUNK, CHUNK), jnp.float32))
        poly = _poly_matrix(pix_i, tile) if moment else None

        def dma(slot, off):
            return pltpu.make_async_copy(
                lane_hbm.at[:, pl.ds(pl.multiple_of(off, CHUNK), CHUNK)],
                lane_buf.at[slot], sem_l.at[slot])

        def one_tile(r, _):
            t = pid * r_batch + r
            s = starts_ref[t]
            e = ends_ref[t]
            a = (s // CHUNK) * CHUNK
            nc = jnp.where(e > s, pl.cdiv(e - a, CHUNK), 0)

            @pl.when(t == 0)
            def _():
                slot_ref[0] = 0

                @pl.when(nc > 0)
                def _():
                    dma(0, a).start()

            s0 = slot_ref[0]
            tx = (t % tiles_x) * tile
            ty = (t // tiles_x) * tile
            if not moment:
                px = (tx + pix_i % tile).astype(jnp.float32)
                py = (ty + pix_i // tile).astype(jnp.float32)

            def chunk_body(carry):
                j, logt, acc = carry
                slot = (s0 + j) % 2

                @pl.when(j > 0)
                def _():
                    dma(slot, a + j * CHUNK).start()

                dma(slot, a + j * CHUNK).wait()
                ent = lane_buf[slot]                      # (feat_k, CHUNK)
                g = a + j * CHUNK + lane
                valid = (g >= s) & (g < e)

                if moment:
                    power = _power_matmul(poly, ent, tx, ty)
                else:
                    dx = px - ent[0:1, :]
                    dy = py - ent[1:2, :]
                    power = (-0.5 * (ent[2:3, :] * dx * dx
                                     + ent[4:5, :] * dy * dy)
                             - ent[3:4, :] * dx * dy)
                alpha = jnp.minimum(ALPHA_MAX,
                                    ent[5:6, :] * jnp.exp(power))
                alpha = jnp.where(
                    (power > 0.0) | (alpha < ALPHA_MIN) | ~valid, 0.0, alpha)
                l1m = jnp.log1p(-alpha)
                log_t_after = logt + _lane_prefix(l1m, tri, tri_mode)
                include = log_t_after >= LOG_T_EPS
                w = jnp.where(include,
                              alpha * jnp.exp(log_t_after - l1m), 0.0)
                acc = acc + jax.lax.dot_general(
                    ent, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (feat_k, P)
                return j + 1, log_t_after[:, CHUNK - 1:CHUNK], acc

            def cond(carry):
                j, logt, _ = carry
                return (j < nc) & (jnp.max(logt) >= LOG_T_EPS)

            init = (jnp.int32(0), jnp.zeros((p, 1), jnp.float32),
                    jnp.zeros((feat_k, p), jnp.float32))
            _, _, acc = jax.lax.while_loop(cond, chunk_body, init)

            @pl.when(t + 1 < t_total)
            def _():
                s_n = starts_ref[t + 1]

                @pl.when(ends_ref[t + 1] > s_n)
                def _():
                    dma(1 - s0, (s_n // CHUNK) * CHUNK).start()
                    slot_ref[0] = 1 - s0

            # Rows 6..6+nv of the accumulator: [ones-row weight sum,
            # values...] — all the caller needs.
            out_ref[r, :, :] = acc[6:7 + nv, :]
            return 0

        def guarded(r, _):
            @pl.when(pid * r_batch + r < t_total)
            def _():
                one_tile(r, None)
            return 0

        jax.lax.fori_loop(0, r_batch, guarded, 0)

    return kernel


@functools.lru_cache(maxsize=64)
def _fwd_only_fns(tiles_x: int, t_total: int, tile: int, nv: int,
                  two_key: bool, interpret: bool, moment: bool,
                  tri_mode: str = "f32"):
    """(keys, payload) -> raw (T, 1+nv, P) per-tile [weight-sum, values]."""
    p = tile * tile
    feat_k = 8 if 7 + nv <= 8 else 16
    r_batch = next((r for r in (8, 5, 6, 4, 3, 2) if t_total % r == 0), 8)
    n_steps = -(-t_total // r_batch)
    t_pad = n_steps * r_batch
    nk = 2 if two_key else 1

    def run(*keys_payload):
        keys, payload = keys_payload[:nk], keys_payload[nk:]
        sorted_ = jax.lax.sort(keys + payload, num_keys=nk, is_stable=False)
        stile = (sorted_[0] >> _rank_bits(t_total)).astype(jnp.int32) \
            if nk == 1 else sorted_[0]
        if len(payload) < 6 + nv:   # bf16-pair-packed (see _pack_cols)
            spay = _unpack_cols(sorted_[nk:], 6 + nv)
        else:
            spay = tuple(jax.lax.bitcast_convert_type(x, jnp.float32)
                         for x in sorted_[nk:])
        tids = jnp.arange(t_total, dtype=stile.dtype)
        starts = jnp.searchsorted(stile, tids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(stile, tids, side="right").astype(jnp.int32)
        ones = jnp.ones_like(spay[0])
        rows = (list(spay[:6]) + [ones] + list(spay[6:6 + nv])
                + [jnp.zeros_like(ones)] * (feat_k - 7 - nv))
        entries_lane = jnp.stack(rows)                 # (feat_k, E)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((r_batch, 1 + nv, p),
                                   lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, feat_k, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )
        out = pl.pallas_call(
            _fwd_only_kernel(tiles_x, tile, t_total, r_batch, nv, moment,
                             tri_mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_pad, 1 + nv, p), jnp.float32),
            interpret=interpret,
        )(starts, ends, entries_lane)
        return out[:t_total]

    return run


def rasterize_pallas_fwd(
    splats: Splats2D,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    entry_budget: int = 0,
    max_span: int = 1024,
    interpret: bool = False,
    with_color: bool = True,
    with_depth: bool = True,
    pack_payload: Optional[bool] = None,
) -> RasterOut:
    """NON-differentiable forward-only Pallas rasterization.

    Identical compositing math/output to rasterize_pallas's forward, minus
    everything the backward needs: no custom_vjp residuals, no seg_end/rank
    bookkeeping, a payload sort that carries only the requested value
    columns (6 geometry operands + depth/colors actually composited — an
    alpha-only render sorts 6 operands instead of 10), and a (1+nv)-row
    output block instead of 17. Serves the seg/eval/360/viewer paths whose
    reference counterparts run thousands of no-grad renders
    (run_3d_seg.py:116-172, eval_wheatgs.py:29-55) and the inference FPS
    path. with_color=False => RasterOut.color is None; with_depth=False =>
    depth is None.
    """
    c = splats.color.shape[1] if with_color else 0
    assert 7 + c + int(with_depth) <= FEAT, "too many color channels"
    n = splats.xy.shape[0]
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y

    if entry_budget <= 0:
        entry_budget = max(1024, -(-16 * n // CHUNK) * CHUNK)
    assert entry_budget % CHUNK == 0, "entry_budget must be 128-aligned"

    extra_cols = ((6,) if with_depth else ()) + \
        (tuple(range(8, 8 + c)) if with_color else ())
    nv = len(extra_cols)
    packed = jax.lax.stop_gradient(pack_splats(splats))
    keys, payload, _, _, total, alive = _alloc_entries(
        packed, jax.lax.stop_gradient(splats), width, height, tile,
        int(entry_budget), max_span, interpret=interpret,
        extra_cols=extra_cols, pack_payload=pack_payload)
    run = _fwd_only_fns(tiles_x, t_total, tile, nv, len(keys) == 2,
                        interpret, _moment_kernels_enabled(), _tri_mode())
    raw = run(*keys, *payload)                        # (T, 1+nv, P)

    def assemble(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, channels, tile, tile)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * tile, tiles_x * tile)
        return img[:, :height, :width]

    img = assemble(raw, 1 + nv)
    alpha = img[0]                                    # weight sum = 1 - T
    vi = 1
    depth = None
    if with_depth:
        depth = img[vi]
        vi += 1
    color = None
    if with_color:
        color = img[vi:vi + c]
        if bg is not None:
            color = color + (1.0 - alpha)[None] * \
                jnp.asarray(bg)[:, None, None]
    return RasterOut(color=color, depth=depth, alpha=alpha,
                     radii=splats.radius, entries_total=total,
                     entries_alive=alive)


@functools.lru_cache(maxsize=64)
def _composite_fns(tiles_x: int, t_total: int, tile: int, c: int,
                   two_key: bool, n_rows: int, budget: int,
                   interpret: bool, moment: bool = True,
                   tri_mode: str = "f32", n_pay: int = -1):
    """custom_vjp'd (packed, owner, *keys) -> raw per-tile accumulators
    (T, FEAT+1, P): full feature sums + final transmittance row. The entry
    sort runs inside, so the backward can map entry gradients to packed
    rows without any random access. Background is applied by the caller
    (differentiable XLA), which keeps the kernels bg-free and lets the
    backward recover its suffix total A = g . acc without a replay pass."""
    p = tile * tile
    # Tiles per grid step (grid-overhead amortizer). Prefer a divisor of
    # t_total: the padded (t_pad, 17, P) output otherwise costs a 130 MB
    # slice in fwd + a pad in bwd every step (1600x1200/32 => 1875 tiles
    # = 3 * 5^4, so 5 divides it; 8 does not).
    r_batch = next((r for r in (8, 5, 6, 4, 3, 2) if t_total % r == 0), 8)
    n_steps = -(-t_total // r_batch)
    t_pad = n_steps * r_batch

    def run_fwd(entries_lane, starts, ends):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((r_batch, FEAT + 1, p),
                                   lambda t, *_: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )
        out = pl.pallas_call(
            _fwd_kernel(tiles_x, tile, t_total, r_batch, moment, tri_mode),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t_pad, FEAT + 1, p),
                                           jnp.float32),
            interpret=interpret,
        )(starts, ends, entries_lane)
        return out[:t_total]

    nk = 2 if two_key else 1

    @jax.custom_vjp
    def comp(packed, order, seg_end, *keys_payload):
        # `packed` is the differentiation anchor only: the forward values
        # ride the sort as stop-gradient payload (keys_payload), and the
        # backward maps entry gradients straight to d(packed) — the same
        # numbers, one gather instead of three.
        del packed, order, seg_end
        entries_lane, starts, ends, _ = _sorted_stream(
            keys_payload[:nk], keys_payload[nk:], t_total, c)
        return run_fwd(entries_lane, starts, ends)

    def comp_fwd(packed, order, seg_end, *keys_payload):
        del packed
        # The sorted entry table is both the forward input and the
        # backward's replay data — keep it as a residual.
        entries_lane, starts, ends, sowner = _sorted_stream(
            keys_payload[:nk], keys_payload[nk:], t_total, c)
        out = run_fwd(entries_lane, starts, ends)
        return out, (entries_lane, starts, ends, sowner, order, seg_end,
                     out)

    def comp_bwd(res, g):
        entries_lane, starts, ends, sowner, order, seg_end, out = res
        e_pad = entries_lane.shape[1]
        # g is the cotangent of the RAW output (acc rows + t_final row,
        # channel-major (T, FEAT+1, P)). Suffix total per pixel, EXACTLY
        # linear in the stored accumulator: A = sum_k w_k u_k =
        # sum_f g[f] * acc[f]; plus the t_final chain c2 = g_tfin * t_final.
        a_total = (g[:, :FEAT, :] * out[:, :FEAT, :]).sum(1, keepdims=True)
        c2 = g[:, FEAT:FEAT + 1, :] * out[:, FEAT:FEAT + 1, :]
        aux = jnp.concatenate([a_total, c2], axis=1)          # (T, 2, P)
        if t_pad > t_total:
            zpad = ((0, t_pad - t_total), (0, 0), (0, 0))
            g = jnp.pad(g, zpad)
            aux = jnp.pad(aux, zpad)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),        # entries
                pl.BlockSpec((r_batch, FEAT + 1, p),
                             lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),       # g
                pl.BlockSpec((r_batch, 2, p), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),       # [A, c2]
                pl.BlockSpec(memory_space=pl.ANY),        # zero seed
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),  # dentries lane
            scratch_shapes=[
                pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
                pltpu.VMEM((2, FEAT, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SMEM((4,), jnp.int32),
            ],
        )
        # The output aliases a zero buffer so rows past each tile's
        # transmittance stop (never written by the early-exiting replay)
        # already hold their correct zero gradient. Alias indices count the
        # scalar-prefetch operands first: input 5 is the zero seed.
        dzero = jnp.zeros((FEAT, e_pad), jnp.float32)
        if "bwdkernel" in _PROF_SKIP:
            dent_lane = dzero + aux.sum() * 0  # keep inputs live
        else:
            dent_lane = pl.pallas_call(
                _bwd_kernel(tiles_x, tile, t_total, r_batch, moment,
                            tri_mode),
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((FEAT, e_pad), jnp.float32),
                input_output_aliases={5: 0},
                interpret=interpret,
            )(starts, ends, entries_lane, g, aux, dzero)

        # Sort-based duplicate-free reduction back to per-splat grads:
        # entry gradients sorted by OWNING GAUSSIAN (grouping each
        # gaussian's entries contiguously), then a sorted-indices
        # segment-sum — both scale with the entry budget. Rows the replay
        # never wrote (sentinel tail, post-transmittance-stop) are exact
        # zeros via the aliased zero seed, so no masking is needed.
        cols = [dent_lane[f] for f in range(8 + c)]
        # Pack column pairs as bf16 halves of one uint32 sort operand: the
        # reduction sort's cost scales with operand count AND bandwidth, so
        # this roughly halves it. Per-entry gradients round to bf16 BEFORE
        # the per-splat sum (~0.4% relative error — far below SGD noise;
        # the backend gradient-parity tests bound it).
        if len(cols) % 2:
            cols.append(jnp.zeros_like(cols[0]))
        pairs = tuple(
            jax.lax.bitcast_convert_type(
                cols[i].astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
            | (jax.lax.bitcast_convert_type(
                cols[i + 1].astype(jnp.bfloat16),
                jnp.uint16).astype(jnp.uint32) << 16)
            for i in range(0, len(cols), 2))
        if "redsort" in _PROF_SKIP:
            sorted_ = (sowner.astype(jnp.uint32),) + pairs
        else:
            sorted_ = jax.lax.sort((sowner.astype(jnp.uint32),) + pairs,
                                   num_keys=1, is_stable=False)
        unpacked = []
        for w in sorted_[1:]:
            unpacked.append(jax.lax.bitcast_convert_type(
                (w & 0xFFFF).astype(jnp.uint16), jnp.bfloat16))
            unpacked.append(jax.lax.bitcast_convert_type(
                (w >> 16).astype(jnp.uint16), jnp.bfloat16))
        vals_lane = jnp.stack([col.astype(jnp.float32)
                               for col in unpacked[:8 + c]])   # (8+c, E)
        # Rank r's segment in the rank-grouped stream is bounded by the
        # ANALYTIC seg_end (clip of the allocation-count cumsum, an
        # N-scale residual from _alloc_entries) — recovering it here via
        # searchsorted would be an E-scale binary-search gather chain
        # (measured 18.7 ms/step). Tail/cropped slots land in empty or
        # later segments but carry exact-zero rows, so any attribution of
        # them is harmless. Then the mask-matmul Pallas segment sum —
        # scatter-free and lane-dense (a (E, 8+c) row-major layout would
        # lane-pad 8+c -> 128 and move ~12x the bytes).
        if "segsum" in _PROF_SKIP:
            dpacked_r = (jnp.zeros((n_rows, 8 + c), jnp.float32)
                         + vals_lane.sum() * 0)
        else:
            dpacked_r = _segment_sum_sorted(vals_lane, seg_end, n_rows,
                                            interpret)
        # Rank space -> original order (one N-scale row gather).
        rank = jnp.zeros((n_rows,), jnp.int32).at[order].set(
            jnp.arange(n_rows, dtype=jnp.int32), unique_indices=True)
        dpacked = dpacked_r[rank]
        from jax import dtypes

        e_b = sowner.shape[0]
        d_order = np.zeros((n_rows,), dtypes.float0)
        d_seg = np.zeros((n_rows,), dtypes.float0)
        # Keys AND payload are integer operands => float0 cotangents: no
        # zero-arithmetic backward graph is built for the entry stream.
        kp_zeros = tuple(np.zeros((e_b,), dtypes.float0)
                         for _ in range(nk + (7 + c if n_pay < 0
                                               else n_pay)))
        return (dpacked, d_order, d_seg) + kp_zeros

    comp.defvjp(comp_fwd, comp_bwd)
    return comp


def rasterize_pallas(
    splats: Splats2D,
    width: int,
    height: int,
    bg: Optional[jnp.ndarray] = None,
    tile: int = TILE,
    max_tiles_per_gauss: int = 16,   # unused (XLA-backend compat)
    entry_budget: int = 0,
    max_span: int = 1024,
    interpret: bool = False,
    pack_payload: Optional[bool] = None,
) -> RasterOut:
    """Differentiable Pallas rasterization (custom_vjp backward kernel).

    entry_budget: static size of the exact-allocation slot array
    (0 = auto: 16 entries per gaussian, fine for small scenes/tests). ALL
    entry-stream work (sorts, payload gather, kernels, gradient reduction)
    scales with it. When the scene's allocation demand exceeds the budget,
    tail gaussians' entries are cropped and the returned
    ``entries_total > entry_budget`` flags it (the training loop re-probes
    and raises the budget rung on this signal).
    """
    del max_tiles_per_gauss
    c = splats.color.shape[1]
    assert c <= FEAT - 8, f"at most {FEAT - 8} color channels"
    n = splats.xy.shape[0]
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    p = tile * tile

    if entry_budget <= 0:
        entry_budget = max(1024, -(-16 * n // CHUNK) * CHUNK)
    assert entry_budget % CHUNK == 0, "entry_budget must be 128-aligned"

    packed = pack_splats(splats)
    keys, payload, order, seg_end, total, alive = _alloc_entries(
        jax.lax.stop_gradient(packed), jax.lax.stop_gradient(splats),
        width, height, tile, int(entry_budget), max_span,
        interpret=interpret, pack_payload=pack_payload)
    comp = _composite_fns(tiles_x, t_total, tile, c,
                          len(keys) == 2, n, int(entry_budget), interpret,
                          _moment_kernels_enabled(), _tri_mode(),
                          n_pay=len(payload))
    out = comp(packed, order, seg_end, *keys, *payload)

    def assemble(flat, channels):
        img = flat.reshape(tiles_y, tiles_x, channels, tile, tile)
        img = img.transpose(2, 0, 3, 1, 4).reshape(
            channels, tiles_y * tile, tiles_x * tile)
        return img[:, :height, :width]

    # Raw layout: channel-major packed feature accumulator (FEAT rows) +
    # final transmittance row. The kernel composites over black; bg is
    # applied here (differentiable XLA), so bg may be a traced array.
    # Assemble only the consumed channels (colors + depth + transmittance)
    # — tiling->image transposes of the full 17-row accumulator cost ~3x
    # the bytes in fwd AND in its backward mirror.
    raw = out.reshape(t_total, FEAT + 1, p)
    sel = jnp.concatenate(
        [raw[:, 8:8 + c], raw[:, 6:7], raw[:, FEAT:FEAT + 1]], axis=1)
    img = assemble(sel, c + 2)
    color = img[:c]
    alpha = 1.0 - img[c + 1]
    if bg is not None:
        color = color + (1.0 - alpha)[None] * jnp.asarray(bg)[:, None, None]
    return RasterOut(color=color, depth=img[c], alpha=alpha,
                     radii=splats.radius, entries_total=total,
                     entries_alive=alive)
