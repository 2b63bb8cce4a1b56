"""GaussianState / Adam / densification tests, incl. a torch-Adam cross-check
and an end-to-end smoke training run on a synthetic scene."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu import testing
from wheat3dgs_tpu.config import OptimizationParams
from wheat3dgs_tpu.models import gaussians as G
from wheat3dgs_tpu.models.optim import adam_init, adam_step
from wheat3dgs_tpu.ops.knn import knn_mean_sq_dist
from wheat3dgs_tpu.render.pipeline import RasterConfig, render
from wheat3dgs_tpu.training import Trainer


def test_knn_matches_numpy():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, block=64))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_adam_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(8, 3)).astype(np.float32)
    grads = [rng.normal(size=(8, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.tensor(p0))
    topt = torch.optim.Adam([tp], lr=0.01, eps=1e-15)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    params = {"p": jnp.asarray(p0)}
    opt = adam_init(params)
    for g in grads:
        params, opt = adam_step(opt, {"p": jnp.asarray(g)}, params,
                                {"p": jnp.float32(0.01)})
    np.testing.assert_allclose(np.asarray(params["p"]),
                               tp.detach().numpy(), atol=1e-6)


def _tiny_state(n=6, cap=16, sh_degree=1):
    rng = np.random.default_rng(2)
    k = (sh_degree + 1) ** 2
    params = G.GaussianParams(
        means=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        quats=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0),
        log_scales=jnp.asarray(np.log(rng.uniform(0.05, 0.2, (n, 3))),
                               jnp.float32),
        sh_dc=jnp.asarray(rng.normal(size=(n, 3)), jnp.float32),
        sh_rest=jnp.zeros((n, 3 * (k - 1)), jnp.float32),
        opacity_logit=jnp.full((n,), 2.0, jnp.float32))
    return G.init_state(params, capacity=cap)


def test_create_from_pcd_scales():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    state = G.create_from_pcd(pts, np.full((4, 3), 0.5, np.float32), 3)
    assert int(state.num_alive) == 4
    # neighbours of point 0 at distances 1,1,1 -> mean sq dist 1 -> scale 1.
    s = np.exp(np.asarray(state.params.log_scales[0]))
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_densify_clone_and_split():
    state = _tiny_state()
    # Mark slot 0 a hot small gaussian (clone), slot 1 a hot big one (split).
    state = dataclasses.replace(
        state,
        grad_accum=jnp.zeros(16).at[0].set(1.0).at[1].set(1.0),
        denom=jnp.zeros(16).at[0].set(1.0).at[1].set(1.0))
    small = jnp.log(jnp.full((3,), 0.001))
    big = jnp.log(jnp.full((3,), 0.5))
    params = dataclasses.replace(
        state.params,
        log_scales=state.params.log_scales.at[0].set(small).at[1].set(big))
    state = dataclasses.replace(state, params=params)

    new, info = G.densify_and_prune(
        state, jax.random.PRNGKey(0), grad_threshold=0.5, min_opacity=0.005,
        extent=1.0, max_screen_size=0.0, percent_dense=0.01)
    assert int(info["n_clone"]) == 1
    assert int(info["n_split"]) == 1
    assert int(info["n_pruned"]) == 0
    # 6 alive - 1 split original + 1 clone + 2 split samples = 8
    assert int(info["n_alive"]) == 8
    assert int(new.num_alive) == 8
    # split children have scales / 1.6
    alive_scales = np.exp(np.asarray(new.params.log_scales))[np.asarray(new.alive)]
    assert np.isclose(np.sort(alive_scales.max(1))[-1], 0.5 / 1.6, rtol=1e-4)
    # moments of fresh slots are zero
    mu = np.asarray(new.adam.mu.means)
    assert (mu[6:] == 0).all()


def test_densify_prunes_transparent():
    state = _tiny_state()
    params = dataclasses.replace(
        state.params,
        opacity_logit=state.params.opacity_logit.at[2].set(-10.0))
    state = dataclasses.replace(state, params=params)
    new, info = G.densify_and_prune(
        state, jax.random.PRNGKey(0), grad_threshold=9.9, min_opacity=0.005,
        extent=1.0, max_screen_size=0.0)
    assert int(info["n_pruned"]) == 1
    assert not bool(new.alive[2])
    assert int(new.num_alive) == 5


def test_densify_capacity_overflow_drops():
    state = _tiny_state(n=14, cap=16)
    state = dataclasses.replace(
        state, grad_accum=jnp.ones(16), denom=jnp.ones(16))
    new, info = G.densify_and_prune(
        state, jax.random.PRNGKey(0), grad_threshold=0.0, min_opacity=0.005,
        extent=100.0, max_screen_size=0.0)  # huge extent => all clones
    assert int(info["n_dropped"]) == 14 - 2
    assert int(new.num_alive) == 16
    grown = G.grow_capacity(new, 32)
    assert grown.capacity == 32 and int(grown.num_alive) == 16


def test_reset_opacity():
    state = _tiny_state()
    new = G.reset_opacity(state)
    op = np.asarray(jax.nn.sigmoid(new.params.opacity_logit))[:6]
    assert (op <= 0.0101).all()
    assert (np.asarray(new.adam.mu.opacity_logit) == 0).all()


@pytest.mark.slow
def test_training_smoke_loss_decreases():
    """End-to-end: fit a tiny random scene; PSNR must improve markedly."""
    cam = testing.look_at_camera(width=48, height=32)
    g = testing.random_gaussians(n=30, seed=7, spread=0.6)
    s = testing.project_scene(g, cam, use_colors=True)
    from wheat3dgs_tpu.ops.reference_raster import rasterize_naive
    gt = jnp.clip(rasterize_naive(s, cam.width, cam.height)["color"], 0, 1)

    pts = g["means3d"] + np.random.default_rng(0).normal(
        scale=0.05, size=g["means3d"].shape).astype(np.float32)
    state = G.create_from_pcd(pts, g["colors"], sh_degree=1, capacity=64)
    opt = OptimizationParams(iterations=60, densify_from_iter=10,
                             densify_until_iter=50,
                             densification_interval=20,
                             opacity_reset_interval=10_000)
    config = RasterConfig(max_tiles_per_gauss=16, max_per_tile=64,
                          tile_batch=6)
    trainer = Trainer(state, opt, cameras_extent=1.0, sh_degree=1,
                      config=config)
    cam_arrays = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                  jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
                  jnp.float32(cam.tanfovy))
    first = None
    for it in range(1, opt.iterations + 1):
        m = trainer.step(it, cam_arrays, gt, cam.width, cam.height)
        if first is None:
            first = float(m["psnr"])
    last = float(m["psnr"])
    assert last > first + 3.0, (first, last)

    out = render(trainer.state, *cam_arrays, cam.width, cam.height,
                 sh_degree=1, config=config)
    assert float(jnp.abs(out.color - gt).mean()) < 0.1


def test_step_block_matches_sequential():
    """train_step_scan(K) == K sequential train_step calls (same views,
    same schedule), so the block API is a pure dispatch optimization."""
    import copy

    cam = testing.look_at_camera(width=48, height=32)
    g = testing.random_gaussians(n=25, seed=3, spread=0.6)
    s = testing.project_scene(g, cam, use_colors=True)
    from wheat3dgs_tpu.ops.reference_raster import rasterize_naive
    gt = jnp.clip(rasterize_naive(s, cam.width, cam.height)["color"], 0, 1)

    state = G.create_from_pcd(g["means3d"], g["colors"], sh_degree=1,
                              capacity=32)
    opt = OptimizationParams(iterations=8, densify_from_iter=1000,
                             opacity_reset_interval=10_000)
    config = RasterConfig(max_tiles_per_gauss=16, max_per_tile=64,
                          tile_batch=6)
    mk = lambda: Trainer(copy.deepcopy(state), opt, cameras_extent=1.0,
                         sh_degree=1, config=config,
                         adaptive_occupancy=False)
    t_seq, t_blk = mk(), mk()
    cam_arrays = (jnp.asarray(cam.w2c), jnp.asarray(cam.full_proj),
                  jnp.asarray(cam.cam_center), jnp.float32(cam.tanfovx),
                  jnp.float32(cam.tanfovy))
    for it in range(1, 5):
        m_seq = t_seq.step(it, cam_arrays, gt, cam.width, cam.height)

    stacks = tuple(jnp.asarray(a)[None] for a in cam_arrays)
    m_blk = t_blk.step_block(1, [0, 0, 0, 0], stacks, gt[None],
                             cam.width, cam.height, n_steps=4)
    np.testing.assert_allclose(float(m_blk["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    # Adam's normalized update amplifies last-ulp gradient noise into
    # +-lr-sized steps on parameters whose true gradient is ~0 (the quats
    # of isotropic splats), so tolerances are per-leaf: tight where the
    # gradient signal is real, lr-scale where it is noise.
    tol = {"quats": 2e-2, "opacity_logit": 1e-3}
    for name in ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                 "opacity_logit"):
        a = np.asarray(getattr(t_seq.state.params, name))
        b = np.asarray(getattr(t_blk.state.params, name))
        np.testing.assert_allclose(a, b, atol=tol.get(name, 1e-4),
                                   err_msg=name)
