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


@pytest.mark.slow
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


def test_vpu_variant_matches_moment_kernels(monkeypatch):
    """WHEAT3DGS_MOMENT_KERNELS=0 (direct VPU polynomial kernels) must be
    numerically equivalent to the default MXU moment-form kernels: the
    toggle exists for on-chip perf A/B attribution, not behavior."""
    from wheat3dgs_tpu.ops import projection

    cam = testing.look_at_camera(width=48, height=32)
    g = testing.random_gaussians(n=40, seed=11, spread=0.7)
    gt = jnp.asarray(np.random.default_rng(1).random((3, 32, 48)),
                     jnp.float32)
    bg = jnp.array([0.3, 0.2, 0.1], jnp.float32)

    def loss(means, scales, opac):
        s = projection.project_gaussians(
            means, scales, jnp.asarray(g["quats"]), opac, cam.w2c,
            cam.full_proj, cam.cam_center, cam.tanfovx, cam.tanfovy,
            48, 32, colors=jnp.asarray(g["colors"]))
        out = rasterize_pallas(s, 48, 32, bg, max_tiles_per_gauss=16,
                               interpret=INTERPRET)
        return (((out.color - gt) ** 2).mean() + out.depth.mean() * 0.1
                + out.alpha.mean() * 0.05)

    args = (jnp.asarray(g["means3d"]), jnp.asarray(g["scales"]),
            jnp.asarray(g["opacities"]))
    # Pin both variants explicitly so the test keeps comparing them even if
    # the shipped default flips after an on-chip A/B.
    monkeypatch.setenv("WHEAT3DGS_MOMENT_KERNELS", "1")
    v_mom, g_mom = jax.value_and_grad(loss, argnums=(0, 1, 2))(*args)
    monkeypatch.setenv("WHEAT3DGS_MOMENT_KERNELS", "0")
    v_vpu, g_vpu = jax.value_and_grad(loss, argnums=(0, 1, 2))(*args)
    assert np.allclose(float(v_mom), float(v_vpu), rtol=1e-5, atol=1e-6)
    for a, b in zip(g_mom, g_vpu):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 5e-3


def test_packed_payload_close_to_unpacked(monkeypatch):
    """W3_PACK_PAYLOAD=1 (bf16-pair-packed entry-sort payload) must stay
    within bf16 rounding of the unpacked stream: >= 40 dB forward PSNR and
    2% relative gradient agreement. x/y ride exact f32 either way."""
    from wheat3dgs_tpu.ops import projection
    from wheat3dgs_tpu.ops.pallas_raster import rasterize_pallas_fwd

    cam = testing.look_at_camera(width=48, height=32)
    g = testing.random_gaussians(n=60, seed=7, spread=0.7)
    gt = jnp.asarray(np.random.default_rng(2).random((3, 32, 48)),
                     jnp.float32)
    bg = jnp.array([0.25, 0.5, 0.75], jnp.float32)

    def run(means, scales, opac):
        s = projection.project_gaussians(
            means, scales, jnp.asarray(g["quats"]), opac, cam.w2c,
            cam.full_proj, cam.cam_center, cam.tanfovx, cam.tanfovy,
            48, 32, colors=jnp.asarray(g["colors"]))
        out = rasterize_pallas(s, 48, 32, bg, interpret=INTERPRET)
        loss = (((out.color - gt) ** 2).mean() + out.depth.mean() * 0.1
                + out.alpha.mean() * 0.05)
        return loss, out.color

    def run_fwd_only(means, scales, opac):
        s = projection.project_gaussians(
            means, scales, jnp.asarray(g["quats"]), opac, cam.w2c,
            cam.full_proj, cam.cam_center, cam.tanfovx, cam.tanfovy,
            48, 32, colors=jnp.asarray(g["colors"]))
        return rasterize_pallas_fwd(s, 48, 32, bg,
                                    interpret=INTERPRET).color

    args = (jnp.asarray(g["means3d"]), jnp.asarray(g["scales"]),
            jnp.asarray(g["opacities"]))
    grad_fn = jax.grad(lambda *a: run(*a)[0], argnums=(0, 1, 2))
    monkeypatch.setenv("W3_PACK_PAYLOAD", "0")
    g_ref = grad_fn(*args)
    c_ref = run(*args)[1]
    cf_ref = run_fwd_only(*args)
    monkeypatch.setenv("W3_PACK_PAYLOAD", "1")
    g_pk = grad_fn(*args)
    c_pk = run(*args)[1]
    cf_pk = run_fwd_only(*args)

    for a, b in ((c_ref, c_pk), (cf_ref, cf_pk)):
        mse = float(((np.asarray(a) - np.asarray(b)) ** 2).mean())
        psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 40.0, f"packed-vs-unpacked PSNR {psnr:.1f} dB"
    for a, b in zip(g_ref, g_pk):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / scale < 0.02


@pytest.mark.slow
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
    # Gradients: the cumsum-based segment reduction sums each splat's
    # entries in a budget-dependent association order, so equality is
    # near-exact rather than bitwise.
    np.testing.assert_allclose(np.asarray(grad_b), np.asarray(grad_full),
                               atol=1e-3, rtol=1e-3)

    # An over-tight budget degrades gracefully (finite outputs, no crash).
    _, out_tight = loss(s.opacity, 128)
    assert np.isfinite(np.asarray(out_tight.color)).all()


def test_pallas_overflow_telemetry():
    """entries_total reports the true allocation demand regardless of the
    budget, so demand > budget (cropped entries) is always detectable."""
    from wheat3dgs_tpu.ops.binning import capped_rect, num_tiles

    cam = testing.look_at_camera(width=64, height=48)
    g = testing.random_gaussians(n=120, seed=9, spread=0.8)
    s = testing.project_scene(g, cam, use_colors=True)

    tx, ty = num_tiles(64, 48, 16)
    _, _, _, _, count = capped_rect(s, tx, ty, 16, 1024)
    demand = int(count.sum())
    assert demand > 128

    ample = rasterize_pallas(s, 64, 48, tile=16, entry_budget=4096,
                             interpret=INTERPRET)
    assert int(ample.entries_total) == demand
    assert 0 < int(ample.entries_alive) <= demand

    tight = rasterize_pallas(s, 64, 48, tile=16, entry_budget=128,
                             interpret=INTERPRET)
    assert int(tight.entries_total) == demand  # > budget => crop detectable


@pytest.mark.slow
def test_trainer_overflow_watchdog(monkeypatch):
    """A splat population that outgrows the entry budget WITHIN a densify
    interval is detected by the per-step telemetry and the budget rung is
    raised before the next step (VERDICT r2 weak #5)."""
    import dataclasses
    import functools

    from wheat3dgs_tpu.config import OptimizationParams
    from wheat3dgs_tpu.models import gaussians as G
    from wheat3dgs_tpu.render.pipeline import RasterConfig
    from wheat3dgs_tpu import training as T
    from wheat3dgs_tpu.training import Trainer

    # The production budget floor (1 << 17) exists to avoid re-jit thrash
    # on real scenes; at interpret-mode test scale it just makes every
    # entry-stream op 100x too large.
    monkeypatch.setattr(
        T, "pick_entry_budget",
        functools.partial(T.pick_entry_budget, floor=512))

    cam = testing.look_at_camera(width=64, height=64)
    g = testing.random_gaussians(n=40, seed=11, spread=0.7)
    state = G.create_from_pcd(g["means3d"], g["colors"], sh_degree=1,
                              capacity=64)
    gt = jnp.zeros((3, 64, 64), jnp.float32)
    opt = OptimizationParams(iterations=10, densify_from_iter=1000,
                             densify_until_iter=0,
                             opacity_reset_interval=10_000)
    trainer = Trainer(state, opt, cameras_extent=1.0, sh_degree=1,
                      config=RasterConfig(backend="pallas"),
                      overflow_check_every=1)
    cam_arrays = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                  jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
                  jnp.float32(cam.tanfovy))
    trainer.step(1, cam_arrays, gt, 64, 64)
    assert trainer.overflow_events == 0

    # Simulate mid-interval inflation by shrinking the budget under the
    # scene's real demand (equivalent to splats outgrowing the rung).
    trainer.config = dataclasses.replace(trainer.config, entry_budget=128)
    m = trainer.step(2, cam_arrays, gt, 64, 64)
    assert int(m["entries_total"]) > 128
    # Deferred readback (round 5): the watchdog consumes the PREVIOUS
    # check's telemetry (no dispatch-pipeline drain on a scalar) and
    # compares it against the CURRENT budget — the shrink applies to the
    # queued demand immediately, so the event still fires this step.
    assert trainer.overflow_events == 1
    assert trainer._occupancy_due  # re-probe scheduled for next step

    trainer.step(3, cam_arrays, gt, 64, 64)
    assert trainer.config.entry_budget >= int(m["entries_total"])
    assert not trainer._occupancy_due


def test_moment_form_power_and_geometry_rows():
    """The MXU moment-form used inside the kernels must equal the naive
    per-(pixel, entry) formulation: conic power via _power_matmul, and the
    six geometry-gradient rows recovered from re-centered moments of dpow
    (extreme tile-local coords: centers near/off tile corners)."""
    from wheat3dgs_tpu.ops import pallas_raster as PR

    tile, p, chunk = 32, 32 * 32, 16
    rng = np.random.default_rng(7)
    tx, ty = 3 * tile, 5 * tile
    # Entries: rows [cx, cy, a, b, c, o] — centers spread past tile borders,
    # SPD conics with wide dynamic range.
    cx = tx + rng.uniform(-20, tile + 20, chunk)
    cy = ty + rng.uniform(-20, tile + 20, chunk)
    la = rng.uniform(1e-3, 0.5, chunk)
    lc = rng.uniform(1e-3, 0.5, chunk)
    lb = rng.uniform(-1, 1, chunk) * np.sqrt(la * lc) * 0.9
    o = rng.uniform(0.05, 0.99, chunk)
    ent = jnp.asarray(np.stack([cx, cy, la, lb, lc, o]), jnp.float32)

    pix_i = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = (tx + pix_i % tile).astype(jnp.float32)
    py = (ty + pix_i // tile).astype(jnp.float32)
    dx = px - ent[0:1, :]
    dy = py - ent[1:2, :]
    power_ref = (-0.5 * (ent[2:3, :] * dx * dx + ent[4:5, :] * dy * dy)
                 - ent[3:4, :] * dx * dy)

    poly = PR._poly_matrix(pix_i, tile)
    power = PR._power_matmul(poly, ent, tx, ty)
    np.testing.assert_allclose(np.asarray(power), np.asarray(power_ref),
                               rtol=1e-5, atol=1e-4)

    # Geometry rows: naive reductions vs the moment recovery.
    dpow = jnp.asarray(
        rng.normal(size=(p, chunk)) * rng.uniform(0, 1, (p, chunk)),
        jnp.float32)
    a_, b_, c_ = ent[2:3, :], ent[3:4, :], ent[4:5, :]
    ref_rows = jnp.concatenate([
        jnp.sum(dpow * (a_ * dx + b_ * dy), 0, keepdims=True),
        jnp.sum(dpow * (b_ * dx + c_ * dy), 0, keepdims=True),
        jnp.sum(-0.5 * dx * dx * dpow, 0, keepdims=True),
        jnp.sum(-dx * dy * dpow, 0, keepdims=True),
        jnp.sum(-0.5 * dy * dy * dpow, 0, keepdims=True),
    ], axis=0)

    mom = jax.lax.dot_general(
        poly, dpow, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    xe = ent[0:1, :] - jnp.float32(tx)
    ye = ent[1:2, :] - jnp.float32(ty)
    s0 = mom[0:1, :]
    e1x = mom[1:2, :] - xe * s0
    e1y = mom[2:3, :] - ye * s0
    exx = mom[3:4, :] - xe * (2.0 * mom[1:2, :] - xe * s0)
    exy = (mom[4:5, :] - xe * mom[2:3, :] - ye * mom[1:2, :]
           + xe * ye * s0)
    eyy = mom[5:6, :] - ye * (2.0 * mom[2:3, :] - ye * s0)
    rows = jnp.concatenate([
        a_ * e1x + b_ * e1y,
        b_ * e1x + c_ * e1y,
        -0.5 * exx,
        -exy,
        -0.5 * eyy,
    ], axis=0)
    scale = np.abs(np.asarray(ref_rows)).max(axis=1, keepdims=True) + 1e-3
    np.testing.assert_allclose(np.asarray(rows) / scale,
                               np.asarray(ref_rows) / scale,
                               rtol=0, atol=3e-4)


def test_fwd_only_matches_pallas_forward():
    """rasterize_pallas_fwd == rasterize_pallas forward (same compositing
    math, trimmed payload/output), across channel subsets."""
    import numpy as np

    from wheat3dgs_tpu import testing
    from wheat3dgs_tpu.ops.pallas_raster import (rasterize_pallas,
                                                 rasterize_pallas_fwd)

    cam = testing.look_at_camera(width=96, height=64)
    g = testing.random_gaussians(n=60, seed=11, spread=0.8)
    s = testing.project_scene(g, cam, use_colors=True)
    interp = jax.default_backend() == "cpu"
    bg = jnp.asarray([0.2, 0.4, 0.1])

    full = rasterize_pallas(s, 96, 64, bg, tile=32, entry_budget=2048,
                            interpret=interp)
    fwd = rasterize_pallas_fwd(s, 96, 64, bg, tile=32, entry_budget=2048,
                               interpret=interp)
    np.testing.assert_allclose(np.asarray(fwd.color),
                               np.asarray(full.color), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fwd.depth),
                               np.asarray(full.depth), atol=1e-5)
    np.testing.assert_allclose(np.asarray(fwd.alpha),
                               np.asarray(full.alpha), atol=1e-5)

    # Alpha-only (6 sort operands) and alpha+depth subsets agree too.
    a_only = rasterize_pallas_fwd(s, 96, 64, tile=32, entry_budget=2048,
                                  interpret=interp, with_color=False,
                                  with_depth=False)
    assert a_only.color is None and a_only.depth is None
    np.testing.assert_allclose(np.asarray(a_only.alpha),
                               np.asarray(full.alpha), atol=1e-5)
    ad = rasterize_pallas_fwd(s, 96, 64, tile=32, entry_budget=2048,
                              interpret=interp, with_color=False,
                              with_depth=True)
    np.testing.assert_allclose(np.asarray(ad.depth),
                               np.asarray(full.depth), atol=1e-5)
    assert int(a_only.entries_alive) == int(full.entries_alive)


def test_render_fwd_pipeline_parity():
    """render_fwd (pallas) == render (pallas) == render (xla) on the same
    state/camera, including the used_mask path."""
    import numpy as np

    from wheat3dgs_tpu import testing
    from wheat3dgs_tpu.models import gaussians as G
    from wheat3dgs_tpu.render.pipeline import (RasterConfig, render,
                                               render_fwd)

    w, h = 64, 64
    tc = testing.look_at_camera(width=w, height=h)
    g = testing.random_gaussians(n=40, seed=3, spread=0.7)
    state = G.create_from_pcd(g["means3d"], g["colors"], sh_degree=2,
                              capacity=64)
    cam = (jnp.asarray(tc.w2c), jnp.asarray(tc.full_proj),
           jnp.asarray(tc.cam_center), jnp.float32(tc.tanfovx),
           jnp.float32(tc.tanfovy))
    cfg_p = RasterConfig(backend="pallas", entry_budget=4096)
    cfg_x = RasterConfig(backend="xla", max_tiles_per_gauss=32,
                         max_per_tile=256, tile_batch=8)
    a = render(state, *cam, w, h, 2, config=cfg_p)
    b = render_fwd(state, *cam, w, h, 2, config=cfg_p)
    c = render(state, *cam, w, h, 2, config=cfg_x)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.color), np.asarray(c.color),
                               atol=2e-3)

    mask = np.zeros(state.capacity, bool)
    mask[: state.capacity // 2] = True
    bm = render_fwd(state, *cam, w, h, 2, used_mask=jnp.asarray(mask),
                    config=cfg_p, with_color=False, with_depth=True)
    cm = render(state, *cam, w, h, 2, used_mask=jnp.asarray(mask),
                config=cfg_x)
    np.testing.assert_allclose(np.asarray(bm.alpha), np.asarray(cm.alpha),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(bm.depth), np.asarray(cm.depth),
                               atol=2e-3)
