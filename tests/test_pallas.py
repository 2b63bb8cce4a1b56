"""Pallas rasterizer tests.

On CPU the kernel runs in interpreter mode (slow — tiny scenes only);
set WHEAT3DGS_TEST_TPU=1 to run compiled on the real chip."""

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


def test_pallas_gradients_match_xla():
    """custom_vjp backward kernel vs XLA autodiff gradients."""
    from wheat3dgs_tpu.ops import projection

    cam = testing.look_at_camera(width=48, height=32)
    g = testing.random_gaussians(n=40, seed=5, spread=0.7)
    gt = jnp.asarray(np.random.default_rng(0).random((3, 32, 48)),
                     jnp.float32)
    bg = jnp.array([0.2, 0.1, 0.4], jnp.float32)

    def make_loss(raster_fn):
        def loss(means, scales, opac):
            s = projection.project_gaussians(
                means, scales, jnp.asarray(g["quats"]), opac, cam.w2c,
                cam.full_proj, cam.cam_center, cam.tanfovx, cam.tanfovy,
                48, 32, colors=jnp.asarray(g["colors"]))
            out = raster_fn(s)
            return (((out.color - gt) ** 2).mean() + out.depth.mean() * 0.1
                    + out.alpha.mean() * 0.05)
        return loss

    args = (jnp.asarray(g["means3d"]), jnp.asarray(g["scales"]),
            jnp.asarray(g["opacities"]))
    gx = jax.grad(make_loss(
        lambda s: raster_ops.rasterize(s, 48, 32, bg,
                                       max_tiles_per_gauss=16,
                                       max_per_tile=128)),
        argnums=(0, 1, 2))(*args)
    gp = jax.grad(make_loss(
        lambda s: rasterize_pallas(s, 48, 32, bg, max_tiles_per_gauss=16,
                                   interpret=INTERPRET)),
        argnums=(0, 1, 2))(*args)
    for a, b in zip(gx, gp):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.02


def test_pallas_entry_budget_slicing():
    """A budget >= the real entry count reproduces the full-expansion
    result exactly (fwd AND grads); the sliced stream only drops sentinel
    slots."""
    from wheat3dgs_tpu.ops import pallas_raster as PR

    cam = testing.look_at_camera(width=64, height=48)
    g = testing.random_gaussians(n=120, seed=7, spread=0.8)
    s = testing.project_scene(g, cam, use_colors=True)
    bg = jnp.array([0.3, 0.1, 0.2], jnp.float32)

    def loss(opacity, budget):
        s2 = s._replace(opacity=opacity)
        out = rasterize_pallas(s2, 64, 48, bg, tile=16,
                               max_tiles_per_gauss=16, entry_budget=budget,
                               interpret=INTERPRET)
        return (out.color.sum() + out.alpha.sum()), out

    # real entries for this scene are well under 120*16; budget 1024 slices
    # most of the sentinel tail.
    _, out_full = loss(s.opacity, 0)
    grad_full = jax.grad(lambda o: loss(o, 0)[0])(s.opacity)
    _, out_b = loss(s.opacity, 1024)
    grad_b = jax.grad(lambda o: loss(o, 1024)[0])(s.opacity)
    np.testing.assert_allclose(np.asarray(out_b.color),
                               np.asarray(out_full.color), atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_b), np.asarray(grad_full),
                               atol=1e-6)

    # An over-tight budget degrades gracefully (finite outputs, no crash).
    _, out_tight = loss(s.opacity, 128)
    assert np.isfinite(np.asarray(out_tight.color)).all()
