"""Pallas rasterizer tests.

On CPU the kernel runs in interpreter mode (slow — tiny scenes only);
set WHEAT3DGS_TEST_TPU=1 to run compiled on the real chip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu import testing
from wheat3dgs_tpu.ops import raster as raster_ops
from wheat3dgs_tpu.ops.pallas_raster import rasterize_pallas

INTERPRET = jax.default_backend() == "cpu"


@pytest.mark.parametrize("tile", [16, 32])
def test_pallas_matches_xla(tile):
    cam = testing.look_at_camera(width=64, height=48)
    g = testing.random_gaussians(n=100, seed=3, spread=0.8)
    s = testing.project_scene(g, cam, use_colors=True)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    ref = raster_ops.rasterize(s, 64, 48, bg, tile=tile,
                               max_tiles_per_gauss=16, max_per_tile=128)
    out = rasterize_pallas(s, 64, 48, bg, tile=tile, max_tiles_per_gauss=16,
                           interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(ref.alpha),
                               atol=1e-2)


def test_pallas_empty_scene():
    """All-culled splats -> pure background, no hangs on empty tiles."""
    cam = testing.look_at_camera(width=32, height=32)
    g = testing.random_gaussians(n=10, seed=0)
    g["means3d"] = g["means3d"] - np.array([0, 0, 100.0], np.float32)  # behind
    s = testing.project_scene(g, cam, use_colors=True)
    bg = jnp.array([0.5, 0.0, 1.0], jnp.float32)
    out = rasterize_pallas(s, 32, 32, bg, max_tiles_per_gauss=8,
                           interpret=INTERPRET)
    img = np.asarray(out.color)
    np.testing.assert_allclose(img[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(img[2], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.alpha), 0.0, atol=1e-6)
