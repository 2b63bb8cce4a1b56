"""Depth-resolved 2D projection of 3D instance labels.

Reference eval_obj_labels (utils/wheatgs_helper.py:245-271 /
eval_wheatgs.py:29-55) renders one full frame PER HEAD in a Python loop —
the slowest part of eval/360 rendering. TPU redesign: all per-head
alpha+depth renders run as one lax.map-batched jit program, and the
sequential overlap-resolution combine (whose state genuinely chains across
heads) is a cheap lax.scan over (H, W) maps. Semantics match the reference
exactly: ascending head order, alpha > 0.5 claims a pixel, and when a new
head overlaps already-claimed pixels it only wins if its mean depth in the
overlap is smaller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..render.pipeline import RasterConfig


@functools.partial(jax.jit, static_argnames=("width", "height", "config",
                                             "head_batch", "with_areas"))
def eval_obj_labels(state: GaussianState, obj_labels: jnp.ndarray, w2c,
                    full_proj, cam_center, tanfovx, tanfovy, *, width: int,
                    height: int, config: RasterConfig = RasterConfig(),
                    head_batch: int = 8, with_areas: bool = False):
    """obj_labels: (L+1, cap) bool membership (row 0 = background, skipped).
    Returns (H, W) int32 pred mask of head ids; with_areas=True also
    returns the (L+1,) int32 AMODAL footprint per head (alpha > 0.5 pixel
    count of the head rendered in isolation, before depth resolution) —
    the synthetic-mask generator's detector-visibility gate reads it."""
    l1 = obj_labels.shape[0]

    def render_head(used_mask):
        # Pallas backend: forward-only kernel, alpha+depth payload only —
        # this per-head render loop is the dominant cost of seg eval/360
        # (reference renders one full frame PER HEAD, eval_wheatgs.py:29-55).
        from ..render.pipeline import render_fwd

        out = render_fwd(state, w2c, full_proj, cam_center, tanfovx,
                         tanfovy, width, height, 0, used_mask=used_mask,
                         config=config, with_color=False, with_depth=True)
        return out.alpha, out.depth

    alphas, depths = jax.lax.map(
        render_head, obj_labels,
        # vmap batching of the Pallas custom path costs ~2x: sequential.
        batch_size=1 if config.backend == "pallas" else head_batch)

    def combine(carry, inp):
        pred_mask, min_depth = carry
        obj_idx, alpha, depth, empty = inp
        pix = (alpha > 0.5) & (obj_idx > 0) & ~empty
        overlap = pix & (pred_mask > 0)
        n_overlap = overlap.sum()
        old_mean = jnp.where(n_overlap > 0,
                             (min_depth * overlap).sum() / jnp.maximum(
                                 n_overlap, 1), 0.0)
        new_mean = jnp.where(n_overlap > 0,
                             (depth * overlap).sum() / jnp.maximum(
                                 n_overlap, 1), 0.0)
        keep_old = (n_overlap > 0) & (old_mean < new_mean)
        pix = jnp.where(keep_old, pix & ~(pred_mask > 0), pix)
        pred_mask = jnp.where(pix, obj_idx, pred_mask)
        min_depth = jnp.where(pix, depth, min_depth)
        return (pred_mask, min_depth), None

    empties = obj_labels.sum(axis=1) == 0
    init = (jnp.zeros((height, width), jnp.int32),
            jnp.ones((height, width), jnp.float32))
    (pred_mask, _), _ = jax.lax.scan(
        combine, init,
        (jnp.arange(l1, dtype=jnp.int32), alphas, depths, empties))
    if with_areas:
        areas = (alphas > 0.5).sum(axis=(1, 2)).astype(jnp.int32)
        return pred_mask, areas
    return pred_mask


def labels_from_seg_maps(state: GaussianState, cams, seg_maps, width: int,
                         height: int, config: RasterConfig = RasterConfig(),
                         obj_num=None):
    """Rebuild global per-Gaussian labels from saved per-view 2DSeg maps
    (reference eval_wheatgs.py render_sets :96-117 / render_360.py:160-177):
    accumulate multi-label used_counts over all train views, then
    multi_instance_opt. Returns (all_counts, all_obj_labels)."""
    import numpy as np

    from . import flashsplat

    if obj_num is None:
        obj_num = int(max(int(np.max(m)) for m in seg_maps))
    all_counts = None
    n_views = cams[0].shape[0]
    for i in range(n_views):
        out = flashsplat.lift_view(
            state, *(c[i] for c in cams), jnp.asarray(seg_maps[i], jnp.int32),
            num_obj=obj_num, width=width, height=height, config=config)
        counts = np.array(out.used_count)
        all_counts = counts if all_counts is None else all_counts + counts
    labels = np.asarray(flashsplat.multi_instance_opt(
        jnp.asarray(all_counts), 0.0))
    return all_counts, labels
