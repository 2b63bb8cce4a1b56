"""Rasterizer tests: projection invariants, binning vs brute force, tiled
composite vs the naive golden rasterizer, and gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu import testing
from wheat3dgs_tpu.ops import binning, projection, raster, reference_raster


@pytest.fixture(scope="module")
def scene():
    cam = testing.look_at_camera(width=64, height=48)
    g = testing.random_gaussians(n=120, seed=3, spread=0.8)
    return g, cam


def test_projection_center_gaussian(scene):
    """A Gaussian at the look-at target projects to the image center."""
    _, cam = scene
    g = testing.random_gaussians(n=1, seed=0)
    g["means3d"] = np.zeros((1, 3), np.float32)
    s = testing.project_scene(g, cam, use_colors=True)
    np.testing.assert_allclose(s.xy[0, 0], (cam.width - 1) / 2, atol=1e-3)
    np.testing.assert_allclose(s.xy[0, 1], (cam.height - 1) / 2, atol=1e-3)
    assert s.depth[0] == pytest.approx(4.0, abs=1e-4)
    assert s.radius[0] > 0


def test_projection_culls_behind_camera(scene):
    _, cam = scene
    g = testing.random_gaussians(n=1, seed=0)
    g["means3d"] = np.array([[0.0, 0.0, -10.0]], np.float32)  # behind eye
    s = testing.project_scene(g, cam, use_colors=True)
    assert s.radius[0] == 0


def test_projection_isotropic_conic(scene):
    """An isotropic Gaussian at the center has an isotropic conic."""
    _, cam = scene
    g = testing.random_gaussians(n=1, seed=0)
    g["means3d"] = np.zeros((1, 3), np.float32)
    g["scales"] = np.full((1, 3), 0.1, np.float32)
    s = testing.project_scene(g, cam, use_colors=True)
    a, b, c = np.asarray(s.conic[0])
    assert b == pytest.approx(0.0, abs=1e-5)
    assert a == pytest.approx(c, rel=1e-4)


def test_binning_matches_bruteforce(scene):
    g, cam = scene
    s = testing.project_scene(g, cam, use_colors=True)
    bins = binning.bin_splats(s, cam.width, cam.height, tile=16,
                              max_tiles_per_gauss=32, max_per_tile=128)
    tiles_x, tiles_y = binning.num_tiles(cam.width, cam.height, 16)
    xy = np.asarray(s.xy)
    radius = np.asarray(s.radius).astype(np.float64)
    depth = np.asarray(s.depth)
    conic = np.asarray(s.conic)
    opac = np.asarray(s.opacity)
    # Brute-force mirror of binning.ellipse_aabb: the exact alpha>=1/255
    # level-set AABB, capped at the reference 3-sigma radius box.
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    det = (a * c - b * b).astype(np.float32)
    q_max = (np.maximum(2.0 * np.log(np.maximum(opac, 1e-12) * 255.0),
                        0.0) + 1e-3).astype(np.float32)
    good = det > 1e-12
    radius = radius.astype(np.float32)
    wx = np.sqrt(np.maximum(q_max * c / np.where(good, det, 1.0),
                            0.0)).astype(np.float32)
    wy = np.sqrt(np.maximum(q_max * a / np.where(good, det, 1.0),
                            0.0)).astype(np.float32)
    wx = np.where(good, np.minimum(wx + np.float32(1e-3), radius), radius)
    wy = np.where(good, np.minimum(wy + np.float32(1e-3), radius), radius)
    for t in range(tiles_x * tiles_y):
        tx, ty = t % tiles_x, t // tiles_x
        expect = []
        for i in range(len(xy)):
            if radius[i] <= 0:
                continue
            # reference getRect radius rect ∩ exact (floor/ceil) AABB rect
            rx0 = np.clip(np.int32((xy[i, 0] - radius[i]) / 16), 0, tiles_x)
            rx1 = np.clip(np.int32((xy[i, 0] + radius[i] + 15) / 16),
                          0, tiles_x)
            ry0 = np.clip(np.int32((xy[i, 1] - radius[i]) / 16), 0, tiles_y)
            ry1 = np.clip(np.int32((xy[i, 1] + radius[i] + 15) / 16),
                          0, tiles_y)
            x0 = max(rx0, np.clip(np.int32(np.floor(
                (xy[i, 0] - wx[i]) / np.float32(16))), 0, tiles_x))
            x1 = min(rx1, np.clip(np.int32(np.floor(
                (xy[i, 0] + wx[i]) / np.float32(16))) + 1, 0, tiles_x))
            y0 = max(ry0, np.clip(np.int32(np.floor(
                (xy[i, 1] - wy[i]) / np.float32(16))), 0, tiles_y))
            y1 = min(ry1, np.clip(np.int32(np.floor(
                (xy[i, 1] + wy[i]) / np.float32(16))) + 1, 0, tiles_y))
            if x0 <= tx < x1 and y0 <= ty < y1:
                expect.append(i)
        expect.sort(key=lambda i: depth[i])
        got = [i for i in np.asarray(bins.tile_lists[t]) if i >= 0]
        assert got == expect, f"tile {t}"
        assert bins.tile_counts[t] == len(expect)


def test_tiled_matches_naive(scene):
    g, cam = scene
    s = testing.project_scene(g, cam, use_colors=True)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)
    golden = reference_raster.rasterize_naive(s, cam.width, cam.height, bg)
    out = raster.rasterize(s, cam.width, cam.height, bg,
                           max_tiles_per_gauss=32, max_per_tile=256)
    np.testing.assert_allclose(out.color, golden["color"], atol=2e-5)
    np.testing.assert_allclose(out.depth, golden["depth"], atol=2e-4)
    np.testing.assert_allclose(out.alpha, golden["alpha"], atol=2e-5)


def test_tiled_matches_naive_odd_size():
    """Non-tile-aligned image sizes crop correctly."""
    cam = testing.look_at_camera(width=50, height=37)
    g = testing.random_gaussians(n=60, seed=9, spread=0.7)
    s = testing.project_scene(g, cam, use_colors=True)
    bg = jnp.zeros(3, jnp.float32)
    golden = reference_raster.rasterize_naive(s, cam.width, cam.height, bg)
    out = raster.rasterize(s, cam.width, cam.height, bg,
                           max_tiles_per_gauss=32, max_per_tile=128)
    np.testing.assert_allclose(out.color, golden["color"], atol=2e-5)


def test_sh_rendering_runs(scene):
    g, cam = scene
    s = testing.project_scene(g, cam, use_colors=False, sh_degree=0)
    out = raster.rasterize(s, cam.width, cam.height)
    assert out.color.shape == (3, cam.height, cam.width)
    assert np.isfinite(np.asarray(out.color)).all()


def test_full_pipeline_gradients(scene):
    """Finite-difference check of d(loss)/d(means3d) through project+raster."""
    g, cam = scene
    g = {k: v[:40] for k, v in g.items()}
    target = jnp.zeros((3, cam.height, cam.width))

    @jax.jit
    def loss_fn(means3d):
        gg = dict(g, means3d=means3d)
        s = testing.project_scene(gg, cam, use_colors=True)
        out = raster.rasterize(s, cam.width, cam.height,
                               max_tiles_per_gauss=32, max_per_tile=128)
        return ((out.color - target) ** 2).mean()

    means = jnp.asarray(g["means3d"])
    grad = jax.jit(jax.grad(loss_fn))(means)
    assert np.isfinite(np.asarray(grad)).all()
    # FD check on a few coordinates with non-trivial gradient.
    flat_grad = np.asarray(grad).ravel()
    order = np.argsort(-np.abs(flat_grad))[:4]
    eps = 2e-3
    for j in order:
        e = np.zeros(means.size, np.float32)
        e[j] = eps
        e = e.reshape(means.shape)
        fd = (loss_fn(means + e) - loss_fn(means - e)) / (2 * eps)
        assert fd == pytest.approx(float(flat_grad[j]), rel=0.12, abs=1e-6)


def test_ndc_offset_gradient_convention(scene):
    """Gradient w.r.t. ndc_offset reproduces the CUDA viewspace-grad scale:
    moving a splat by d_ndc moves it by d_ndc * W/2 pixels."""
    g, cam = scene
    g = {k: v[:20] for k, v in g.items()}
    zeros = jnp.zeros((20, 2), jnp.float32)

    def loss_fn(off):
        s = testing.project_scene(g, cam, use_colors=True, ndc_offset=off)
        out = raster.rasterize(s, cam.width, cam.height,
                               max_tiles_per_gauss=32, max_per_tile=128)
        return (out.color ** 2).mean()

    grad = jax.jit(jax.grad(loss_fn))(zeros)
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0


def test_dead_lane_gradients_finite(scene):
    """Zero-filled dead capacity lanes (the post-densify/prune state) must
    not inject NaNs into ANY gradient leaf: norm()'s backward is q/|q|
    (NaN at q=0) and survives every post-hoc where/max guard via 0*NaN.
    Pins the rsqrt(|q|^2 + eps) normalize in ops/projection.py, which keeps
    jax_debug_nans (--detect_anomaly / --debug_from) usable over training."""
    _, cam = scene
    g = testing.random_gaussians(n=16, seed=7, sh_degree=1)
    dead = np.arange(16) >= 6
    for key in g:
        g[key] = np.asarray(g[key])
        g[key][dead] = 0.0   # densify/prune zero-fills freed lanes
    # one dead lane exactly at the camera center: dirs = 0 in the SH path
    g["means3d"][6] = np.asarray(cam.cam_center)

    def loss_fn(means3d, scales, quats, opacities, sh):
        s = projection.project_gaussians(
            means3d, scales, quats, opacities, cam.w2c, cam.full_proj,
            cam.cam_center, cam.tanfovx, cam.tanfovy, cam.width, cam.height,
            sh=sh, sh_degree=1)
        out = raster.rasterize(s, cam.width, cam.height,
                               max_tiles_per_gauss=32, max_per_tile=128)
        return (out.color ** 2).mean() + out.depth.mean() + out.alpha.mean()

    args = (jnp.asarray(g["means3d"]), jnp.asarray(g["scales"]),
            jnp.asarray(g["quats"]), jnp.asarray(g["opacities"]),
            jnp.asarray(g["sh"]))
    grads = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))(*args)
    for name, gr in zip(("means", "scales", "quats", "opac", "sh"), grads):
        assert np.isfinite(np.asarray(gr)).all(), f"NaN/inf grad in {name}"
