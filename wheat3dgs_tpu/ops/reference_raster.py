"""Naive O(N * pixels) rasterizer — the golden model for kernel tests.

Composites *every* Gaussian at *every* pixel with exact front-to-back
semantics matching the CUDA renderCUDA loop of the reference's
diff-gaussian-rasterization fork (alpha clamp 0.99, skip alpha < 1/255,
terminate when transmittance would drop below 1e-4). Only usable on tiny
scenes; the tiled production path (ops/raster.py) must agree with this
bit-for-bit up to float assoc noise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .projection import Splats2D

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def composite_pixels(pix_xy: jnp.ndarray, splats: Splats2D,
                     bg: jnp.ndarray, tile_grid=None) -> dict:
    """Composite depth-sorted splats at arbitrary pixel centers.

    Args:
      pix_xy: (P, 2) pixel coordinates.
      splats: Splats2D for one view (N splats, any visibility).
      bg: (C,) background color.
      tile_grid: optional (tiles_x, tiles_y, tile) — when given, a splat only
        contributes to pixels whose tile lies in the splat's covered tile
        rectangle, exactly like the CUDA tile binning (a >3-sigma Gaussian
        tail reaching outside its radius box is cut off at tile granularity).

    Returns dict with color (P, C), depth (P,), alpha (P,), n_contrib (P,),
    and weights (P, N) in the *sorted* gaussian order plus the sort order —
    tests use those to validate per-splat attributions.
    """
    order = jnp.argsort(splats.depth, stable=True)
    xy = splats.xy[order]
    conic = splats.conic[order]
    color = splats.color[order]
    opac = splats.opacity[order]
    radius = splats.radius[order]
    depth = splats.depth[order]

    d = pix_xy[:, None, :] - xy[None, :, :]                    # (P, N, 2)
    power = (-0.5 * (conic[None, :, 0] * d[..., 0] ** 2
                     + conic[None, :, 2] * d[..., 1] ** 2)
             - conic[None, :, 1] * d[..., 0] * d[..., 1])      # (P, N)
    alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)
    alpha = jnp.where(radius[None, :] > 0, alpha, 0.0)
    if tile_grid is not None:
        from .binning import tile_rect

        tiles_x, tiles_y, tile = tile_grid
        rx0, ry0, rx1, ry1 = tile_rect(
            xy, radius.astype(xy.dtype), tiles_x, tiles_y, tile)
        ptx = (pix_xy[:, 0] // tile).astype(jnp.int32)
        pty = (pix_xy[:, 1] // tile).astype(jnp.int32)
        in_rect = ((ptx[:, None] >= rx0[None, :]) & (ptx[:, None] < rx1[None, :])
                   & (pty[:, None] >= ry0[None, :]) & (pty[:, None] < ry1[None, :]))
        alpha = jnp.where(in_rect, alpha, 0.0)

    one_minus = 1.0 - alpha
    t_after = jnp.cumprod(one_minus, axis=1)                   # (P, N)
    include = t_after >= T_EPS                                 # CUDA break rule
    t_before = t_after / jnp.where(one_minus == 0.0, 1.0, one_minus)
    weights = jnp.where(include, alpha * t_before, 0.0)        # (P, N)

    # include is a prefix mask (t_after is non-increasing), so the final
    # transmittance is t_after at the last included position = the min.
    t_final = jnp.where(include.any(axis=1),
                        jnp.min(jnp.where(include, t_after, 1.0), axis=1),
                        1.0)
    out_color = weights @ color + t_final[:, None] * bg[None, :]
    out_depth = weights @ depth
    out_alpha = weights.sum(axis=1)
    n_contrib = (weights > 0).sum(axis=1)
    return {"color": out_color, "depth": out_depth, "alpha": out_alpha,
            "n_contrib": n_contrib, "weights": weights, "order": order,
            "t_final": t_final}


def rasterize_naive(splats: Splats2D, width: int, height: int,
                    bg: Optional[jnp.ndarray] = None, tile: int = 16) -> dict:
    """Full-image naive rasterization with CUDA tile-rect cutoff semantics.
    Returns CHW color + HW depth/alpha."""
    if bg is None:
        bg = jnp.zeros((splats.color.shape[1],), splats.color.dtype)
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=1)          # (H*W, 2)
    tile_grid = (-(-width // tile), -(-height // tile), tile)
    out = composite_pixels(pix, splats, bg, tile_grid=tile_grid)
    c = splats.color.shape[1]
    return {
        "color": out["color"].reshape(height, width, c).transpose(2, 0, 1),
        "depth": out["depth"].reshape(height, width),
        "alpha": out["alpha"].reshape(height, width),
        "n_contrib": out["n_contrib"].reshape(height, width),
    }
