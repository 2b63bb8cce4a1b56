"""FlashSplat-style mask lifting: per-(label, Gaussian) contribution counts.

TPU-native replacement for the flashsplat-rasterization CUDA kernel
(reference: gaussian_renderer/__init__.py:109-218, submodule C22 in
SURVEY.md; FlashSplat, arXiv:2409.08270). Forward-only (the reference never
backprops through it — every call sits under torch.no_grad,
run_3d_seg.py:91,130).

For an int label image M and blending weights w_{p,i} (alpha x transmittance
of Gaussian i at pixel p — identical to the render composite), it accumulates

    used_count[l, i] = sum_{p : M[p] == l} w_{p,i}

as one (labels x pixels) @ (pixels x K) matmul per tile — MXU-shaped — then a
scatter-add over the tile's Gaussian indices. The count matrix is additive
across views (run_3d_seg.py:95-97).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE, bin_splats, num_tiles
from .projection import Splats2D
from .raster import _tile_pixel_grid, composite_packed, pack_splats


class LiftOut(NamedTuple):
    used_count: jnp.ndarray   # (num_obj+1, N)
    alpha: jnp.ndarray        # (H, W)
    contrib_num: jnp.ndarray  # (H, W) int32: contributing splats per pixel
    # Per-Gaussian projected pixel center / view depth — the reference
    # flashsplat_render's proj_xy/gs_depth outputs
    # (gaussian_renderer/__init__.py:203-204,215-216). Invisible Gaussians
    # (radius 0) keep their projected values; consumers filter by radii as
    # the reference does.
    proj_xy: jnp.ndarray      # (N, 2) float32 pixel coords
    gs_depth: jnp.ndarray     # (N,) float32 view-space depth


def lift_mask(
    splats: Splats2D,
    gt_mask: jnp.ndarray,
    num_obj: int,
    width: int,
    height: int,
    tile: int = TILE,
    max_tiles_per_gauss: int = 16,
    max_per_tile: int = 512,
    tile_batch: int = 64,
) -> LiftOut:
    """gt_mask: (H, W) int32 labels in [0, num_obj], 0 = background."""
    n = splats.xy.shape[0]
    l1 = num_obj + 1
    tiles_x, tiles_y = num_tiles(width, height, tile)
    t_total = tiles_x * tiles_y
    bins = bin_splats(splats, width, height, tile, max_tiles_per_gauss,
                      max_per_tile)

    # Pad the label image to the tile grid with -1 (contributes to no row —
    # the CUDA kernel never visits out-of-image pixels).
    pad_y = tiles_y * tile - height
    pad_x = tiles_x * tile - width
    labels = jnp.pad(gt_mask.astype(jnp.int32), ((0, pad_y), (0, pad_x)),
                     constant_values=-1)
    # (T, P) per-tile pixel labels.
    labels = labels.reshape(tiles_y, tile, tiles_x, tile).transpose(
        0, 2, 1, 3).reshape(t_total, tile * tile)

    idx = bins.tile_lists                                     # (T, K)
    valid = idx >= 0
    safe = jnp.maximum(idx, 0)
    pix0 = _tile_pixel_grid(tile)
    origins = jnp.stack(
        [(jnp.arange(t_total, dtype=jnp.int32) % tiles_x) * tile,
         (jnp.arange(t_total, dtype=jnp.int32) // tiles_x) * tile],
        axis=1).astype(jnp.float32)
    bg = jnp.zeros((splats.color.shape[1],), splats.color.dtype)
    packed = pack_splats(splats)

    def one_tile(tid, tvalid, origin, tlabels):
        pix = pix0 + origin[None, :]
        _, _, out_a, w = composite_packed(pix, packed[tid], tvalid, bg)
        onehot = (tlabels[:, None] ==
                  jnp.arange(l1, dtype=jnp.int32)[None, :]).astype(w.dtype)
        contrib = jnp.einsum("pl,pk->lk", onehot, w,
                             precision=jax.lax.Precision.HIGHEST)
        return contrib, out_a, (w > 0).sum(axis=1).astype(jnp.int32)

    # Chunked scan with a carried accumulator: memory stays
    # O(tile_batch * (L+1) * K) regardless of label count.
    pad_t = (-t_total) % tile_batch
    def pad0(x, fill=0):
        return jnp.pad(x, [(0, pad_t)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)
    safe_p, valid_p = pad0(safe), pad0(valid, False)
    origins_p, labels_p = pad0(origins), pad0(labels, -1)
    idx_p = pad0(idx, -1)
    n_chunks = safe_p.shape[0] // tile_batch

    def chunk_body(carry, chunk):
        tid, tvalid, origin, tlabels, tidx = chunk
        contrib, out_a, cnum = jax.vmap(one_tile)(tid, tvalid, origin,
                                                  tlabels)
        # (C, L+1, K) -> scatter-add columns into (L+1, N).
        cols = jnp.where(tidx >= 0, tidx, n)                  # drop sentinel
        carry = carry.at[:, cols].add(
            contrib.transpose(1, 0, 2), mode="drop")
        return carry, (out_a, cnum)

    chunks = jax.tree.map(
        lambda x: x.reshape((n_chunks, tile_batch) + x.shape[1:]),
        (safe_p, valid_p, origins_p, labels_p, idx_p))
    used_count, (alphas, cnums) = jax.lax.scan(
        chunk_body, jnp.zeros((l1, n), jnp.float32), chunks)

    def assemble(flat):
        img = flat.reshape(n_chunks * tile_batch, tile, tile)[:t_total]
        img = img.reshape(tiles_y, tiles_x, tile, tile).transpose(
            0, 2, 1, 3).reshape(tiles_y * tile, tiles_x * tile)
        return img[:height, :width]

    return LiftOut(used_count=used_count,
                   alpha=assemble(alphas.reshape(-1, tile * tile)),
                   contrib_num=assemble(cnums.reshape(-1, tile * tile)),
                   proj_xy=splats.xy, gs_depth=splats.depth)


def multi_instance_opt(all_counts: jnp.ndarray, gamma: float = 0.0) -> jnp.ndarray:
    """FlashSplat global optimal assignment (reference multi_instance_opt,
    run_3d_seg.py:54-72 / utils/wheatgs_helper.py:68-86), vectorized: the
    reference's per-object Python loop with a column-wise L2 normalize and
    background bias becomes one batched argmax.

    Input (L+1, N) additive counts; output (L+1, N) bool one-vs-rest labels.
    """
    total = all_counts.sum(axis=0, keepdims=True)             # (1, N)
    own = all_counts                                          # (L+1, N)
    rest = total - own
    norm = jnp.sqrt(own * own + rest * rest)
    norm = jnp.where(norm == 0, 1.0, norm)
    return (own / norm) > (rest / norm + gamma)
