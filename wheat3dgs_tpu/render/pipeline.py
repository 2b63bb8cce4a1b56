"""Render API: GaussianState + camera -> images (reference:
gaussian_renderer/__init__.py `render`, :22-106).

Functional and jit-friendly: all reference outputs are returned
(color/depth/alpha/radii and the viewspace gradient hook via `ndc_offset`);
`override_color` reproduces the label-as-color path used by the seg tooling
(reference render_helper.py:40-64).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianState
from ..ops import raster as raster_ops
from ..ops.projection import project_gaussians


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Static rasterizer knobs (shape-affecting => static under jit).

    backend: "xla" = differentiable padded-tile composite;
    "pallas" = exact-allocation budgeted entry stream + occupancy-
    proportional kernels (training AND inference path on TPU). The Pallas
    kernel uses 32px tiles internally; its backward rounds per-entry
    gradients to bf16 before the per-splat reduction (~0.4% relative —
    bounded by the backend gradient-parity tests; use the XLA backend if
    you need exact-f32 gradients).
    """

    tile: int = 16
    max_tiles_per_gauss: int = 16   # XLA backend only
    max_per_tile: int = 512
    tile_batch: int = 64
    backend: str = "xla"
    # Pallas backend: static size of the exact-allocation entry array
    # (0 = auto 16/gaussian). All entry-stream work scales with it; the
    # budget ladder keeps it at ~1.5x the probed allocation demand, and
    # renders report entries_total so overflow (demand > budget => cropped
    # entries) is detectable instead of silent.
    entry_budget: int = 0
    # Pallas backend: bf16-pair-pack the non-coordinate entry-sort payload
    # columns (conics/opacity/depth/colors — x/y stay exact f32), cutting
    # the phase-1 sort ~40%. ~0.4% bf16 rounding on the packed columns
    # (>= 40 dB forward agreement and 2% gradient agreement vs unpacked,
    # pinned by tests/test_pallas.py::test_packed_payload_close_to_unpacked).
    # None = the W3_PACK_PAYLOAD env default (off).
    pack_payload: Optional[bool] = None


def inference_config(config: RasterConfig = RasterConfig()) -> RasterConfig:
    """Prefer the Pallas forward kernel when a TPU is attached, with the
    bf16-pair-packed entry-sort payload on by default: measured on-chip
    (scripts/exp_pack_ab.py, v5e, 102k splats @1600x1200) packed wins
    44.4 vs 45.5 ms/step and 56.7 vs 53.3 FPS at 69.9 dB forward parity.
    An explicit config.pack_payload (or W3_PACK_PAYLOAD via None in a raw
    RasterConfig) still overrides."""
    backend = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    pack = config.pack_payload
    if pack is None and backend == "pallas":
        pack = True
    return dataclasses.replace(config, backend=backend, pack_payload=pack)


class RenderOut(NamedTuple):
    color: jax.Array    # (3, H, W)
    depth: jax.Array    # (H, W)
    alpha: jax.Array    # (H, W)
    radii: jax.Array    # (N,) int32, 0 = invisible
    # Entry-stream telemetry (Pallas backend; None on the XLA path).
    # entries_total > the configured entry_budget means this render cropped
    # entries — see ops/pallas_raster.rasterize_pallas.
    entries_total: Optional[jax.Array] = None
    entries_alive: Optional[jax.Array] = None


def render(
    state: GaussianState,
    w2c: jax.Array,
    full_proj: jax.Array,
    cam_center: jax.Array,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    used_mask: Optional[jax.Array] = None,
    ndc_offset: Optional[jax.Array] = None,
    config: RasterConfig = RasterConfig(),
) -> RenderOut:
    """Render one view.

    used_mask: optional (N,) bool — render only this subset (the reference
    slices tensors, gaussian_renderer/__init__.py:154-156; masking opacity
    to 0 is equivalent and keeps shapes static).
    """
    opacity = state.opacity()
    if used_mask is not None:
        opacity = jnp.where(used_mask, opacity, 0.0)
    splats = project_gaussians(
        state.params.means, state.scales(), state.params.quats, opacity,
        w2c, full_proj, cam_center, tanfovx, tanfovy, width, height,
        sh=None if override_color is not None else state.sh(),
        sh_degree=sh_degree,
        colors=override_color, scale_modifier=scale_modifier,
        ndc_offset=ndc_offset)
    if config.backend == "pallas":
        from ..ops.pallas_raster import rasterize_pallas

        out = rasterize_pallas(
            splats, width, height, bg, tile=32,
            entry_budget=config.entry_budget,
            pack_payload=config.pack_payload,
            # Interpreter fallback keeps the Pallas backend testable on the
            # CPU suite (tiny scenes only — it is orders slower than XLA).
            interpret=jax.default_backend() == "cpu")
    else:
        out = raster_ops.rasterize(
            splats, width, height, bg, tile=config.tile,
            max_tiles_per_gauss=config.max_tiles_per_gauss,
            max_per_tile=config.max_per_tile, tile_batch=config.tile_batch)
    return RenderOut(color=out.color, depth=out.depth, alpha=out.alpha,
                     radii=out.radii, entries_total=out.entries_total,
                     entries_alive=out.entries_alive)


def render_fwd(
    state: GaussianState,
    w2c: jax.Array,
    full_proj: jax.Array,
    cam_center: jax.Array,
    tanfovx,
    tanfovy,
    width: int,
    height: int,
    sh_degree: int,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    used_mask: Optional[jax.Array] = None,
    config: RasterConfig = RasterConfig(),
    with_color: bool = True,
    with_depth: bool = True,
) -> RenderOut:
    """NON-differentiable render (inference/seg/eval/360 paths).

    On the Pallas backend this uses the forward-only kernel — no custom_vjp
    residuals, payload sort trimmed to the requested channels (alpha-only
    sorts 6 operands instead of 10), (1+nv)-row output — serving the paths
    whose reference counterparts run thousands of no-grad renders
    (run_3d_seg.py:116-172, eval_wheatgs.py:29-55, render_360.py). The XLA
    backend falls back to the standard rasterizer (same outputs).
    with_color/with_depth=False return None for that field (Pallas only).
    """
    opacity = state.opacity()
    if used_mask is not None:
        opacity = jnp.where(used_mask, opacity, 0.0)
    need_sh = with_color and override_color is None
    splats = project_gaussians(
        state.params.means, state.scales(), state.params.quats, opacity,
        w2c, full_proj, cam_center, tanfovx, tanfovy, width, height,
        sh=state.sh() if need_sh else None,
        sh_degree=sh_degree if need_sh else 0,
        colors=(override_color if override_color is not None else
                (None if need_sh else jnp.zeros((state.capacity, 1),
                                                jnp.float32))),
        scale_modifier=scale_modifier)
    if config.backend == "pallas":
        from ..ops.pallas_raster import rasterize_pallas_fwd

        out = rasterize_pallas_fwd(
            splats, width, height, bg, tile=32,
            entry_budget=config.entry_budget,
            pack_payload=config.pack_payload,
            interpret=jax.default_backend() == "cpu",
            with_color=with_color, with_depth=with_depth)
    else:
        out = raster_ops.rasterize(
            splats, width, height, bg, tile=config.tile,
            max_tiles_per_gauss=config.max_tiles_per_gauss,
            max_per_tile=config.max_per_tile, tile_batch=config.tile_batch,
            remat=False)
    return RenderOut(color=out.color, depth=out.depth, alpha=out.alpha,
                     radii=out.radii, entries_total=out.entries_total,
                     entries_alive=out.entries_alive)


# Jitted entry for inference paths (training jits the whole train step).
render_jit = jax.jit(
    render,
    static_argnames=("width", "height", "sh_degree", "scale_modifier",
                     "config"))

render_fwd_jit = jax.jit(
    render_fwd,
    static_argnames=("width", "height", "sh_degree", "scale_modifier",
                     "config", "with_color", "with_depth"))


def adapt_config(state: GaussianState, cam, width: int, height: int,
                 config: RasterConfig = RasterConfig(),
                 headroom: float = 1.15, cams=None) -> RasterConfig:
    # 1.15 default headroom: ALL entry-stream cost scales with the budget,
    # and under-budget is no longer silent (entries_total telemetry; the
    # viewer re-probes and re-renders on overflow), so inference runs
    # close to the probed demand. Training uses the Trainer ladder.
    """Probe tile occupancy / allocation demand and size the rasterizer.

    Pallas backend: the budget is picked from the MAX allocation demand
    over ``cams`` (a list of camera tuples; defaults to just ``cam``) —
    inference paths should pass several representative views so a single
    unlucky probe view cannot under-size the budget and silently crop
    other renders. XLA backend: picks the max_per_tile ladder rung from
    one view's max tile occupancy (see ops/binning.py ladder notes)."""
    import functools

    from ..ops.binning import (count_tiles, pick_entry_budget,
                               pick_max_per_tile)

    @functools.partial(jax.jit, static_argnames=("width", "height", "tile",
                                                 "mtpg"))
    def probe(state, w2c, full_proj, cam_center, tanfovx, tanfovy, *,
              width, height, tile, mtpg):
        splats = project_gaussians(
            state.params.means, state.scales(), state.params.quats,
            state.opacity(), w2c, full_proj, cam_center, tanfovx, tanfovy,
            width, height,
            colors=jnp.zeros((state.capacity, 1), jnp.float32))
        counts = count_tiles(splats, width, height, tile, mtpg)
        return counts.max(), counts.sum()

    if config.backend == "pallas":
        from ..training import entry_demand_probe

        demand = max(
            int(entry_demand_probe(state, *c_, width=width, height=height))
            for c_ in (cams if cams is not None else [cam]))
        return dataclasses.replace(
            config,
            entry_budget=max(config.entry_budget,
                             pick_entry_budget(demand, headroom=headroom)))
    max_count, total = probe(state, *cam, width=width, height=height,
                             tile=config.tile,
                             mtpg=config.max_tiles_per_gauss)
    mpt = pick_max_per_tile(int(max_count), headroom=headroom)
    return dataclasses.replace(config, max_per_tile=mpt)
