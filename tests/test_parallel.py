"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu.config import OptimizationParams
from wheat3dgs_tpu.parallel import mesh as M
from wheat3dgs_tpu.render.pipeline import RasterConfig
from wheat3dgs_tpu.training import train_step, train_step_views


def _state_and_cams(n=200, cap=512, n_views=4, seed=0):
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    state = ge._tiny_state(n, cap, 1, seed=seed)
    cams = [ge._cam(64, 48, seed=seed * 10 + v) for v in range(n_views)]
    return state, cams


def test_mesh_shapes():
    mesh = M.make_mesh(n_plots=2, n_views=4)
    assert mesh.shape == {"plot": 2, "view": 4}


def test_view_batched_step_matches_mean_of_views():
    """B-view step loss == mean of single-view losses (same params)."""
    state, cams = _state_and_cams(n_views=2)
    gt = jnp.full((3, 48, 64), 0.3, jnp.float32)
    opt = OptimizationParams()
    conf = RasterConfig(max_tiles_per_gauss=8, max_per_tile=64, tile_batch=12)
    bg = jnp.zeros(3, jnp.float32)

    singles = []
    for c in cams:
        _, m = train_step(
            jax.tree.map(jnp.copy, state), *c, gt, bg, jnp.int32(1),
            sh_degree=1, width=64, height=48, opt=opt, config=conf)
        singles.append(float(m["loss"]))

    stack = lambda i: jnp.stack([jnp.asarray(c[i]) for c in cams])
    _, mb = train_step_views(
        jax.tree.map(jnp.copy, state), stack(0), stack(1), stack(2),
        stack(3), stack(4), jnp.stack([gt, gt]), bg, jnp.int32(1),
        sh_degree=1, width=64, height=48, opt=opt, config=conf)
    assert float(mb["loss"]) == pytest.approx(np.mean(singles), rel=1e-5)


def test_multi_plot_sharded_step():
    """Full DP step over a (2 plots x 4 views) mesh executes and matches the
    unsharded computation."""
    mesh = M.make_mesh(n_plots=2, n_views=4)
    opt = OptimizationParams()
    conf = RasterConfig(max_tiles_per_gauss=8, max_per_tile=64, tile_batch=12)
    bg = jnp.zeros(3, jnp.float32)
    n_views = 4

    plots = [_state_and_cams(n_views=n_views, seed=p) for p in range(2)]
    states = M.stack_states([p[0] for p in plots])
    stack = lambda i: jnp.stack(
        [jnp.stack([jnp.asarray(c[i]) for c in cams]) for _, cams in plots])
    gts = jnp.full((2, n_views, 3, 48, 64), 0.3, jnp.float32)
    extents = jnp.ones((2,), jnp.float32)

    step = M.build_multi_plot_trainer(mesh, 1, 64, 48, opt, conf)

    # Unsharded ground truth (host copy).
    ref_states, ref_metrics = step(
        jax.tree.map(jnp.copy, states), stack(0), stack(1), stack(2),
        stack(3), stack(4), gts, bg, jnp.int32(1), extents)

    sh_states = M.shard_states(mesh, jax.tree.map(jnp.copy, states))
    args = M.shard_views(mesh, (stack(0), stack(1), stack(2), stack(3),
                                stack(4), gts))
    out_states, metrics = step(sh_states, *args, bg, jnp.int32(1), extents)

    np.testing.assert_allclose(np.asarray(metrics["loss"]),
                               np.asarray(ref_metrics["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_states.params.means),
                               np.asarray(ref_states.params.means),
                               atol=1e-5)
    # The sharded run actually used the mesh.
    assert len(metrics["loss"].sharding.device_set) > 1


def test_gauss_axis_sharded_training_matches_unsharded():
    """Capacity axis sharded over a (2 view x 4 gauss) mesh: several steps
    incl. densify/prune/reset match the unsharded single-device result —
    the memory-headroom path (SURVEY §5.7) is numerically transparent."""
    from wheat3dgs_tpu.models import gaussians as G

    state, cams = _state_and_cams(n=300, cap=512, n_views=2, seed=3)
    gt = jnp.stack([jnp.full((3, 48, 64), 0.35, jnp.float32),
                    jnp.full((3, 48, 64), 0.25, jnp.float32)])
    opt = OptimizationParams()
    conf = RasterConfig(max_tiles_per_gauss=8, max_per_tile=64, tile_batch=12)
    bg = jnp.zeros(3, jnp.float32)
    stack = lambda i: jnp.stack([jnp.asarray(c[i]) for c in cams])
    cam_args = tuple(stack(i) for i in range(5))

    def run(step_fn, st, put):
        st = put(st)
        for it in (1, 2, 3):
            st, m = step_fn(st, *[put(a) for a in cam_args], put(gt), bg,
                            jnp.int32(it))
            if it == 2:   # exercise the sharded densify path too
                st, _ = jax.jit(G.densify_and_prune, static_argnums=(5,))(
                    st, jax.random.PRNGKey(0), 1e-5, 0.005,
                    jnp.float32(1.0), 0.0)
                st = G.reset_opacity(st)
        return st, m

    mesh = M.make_gauss_mesh(n_view=2, n_gauss=4)
    sharded_step = M.build_gauss_sharded_trainer(
        mesh, 1, 64, 48, opt, conf)
    st_sh, m_sh = run(
        sharded_step, jax.tree.map(jnp.copy, state),
        lambda t: M.shard_state_gauss(mesh, t) if hasattr(t, "params")
        else jax.device_put(t, jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec("view"))))

    import functools

    base_step = functools.partial(
        train_step_views, sh_degree=1, width=64, height=48, opt=opt,
        config=conf)
    st_ref, m_ref = run(lambda st, *a: base_step(st, *a),
                        jax.tree.map(jnp.copy, state), lambda t: t)

    # state leaves stay sharded over 'gauss' (memory actually distributed)
    assert st_sh.params.means.sharding.spec == \
        jax.sharding.PartitionSpec("gauss")
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st_sh.params.means),
                               np.asarray(st_ref.params.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_sh.alive),
                               np.asarray(st_ref.alive))
    np.testing.assert_allclose(np.asarray(st_sh.params.opacity_logit),
                               np.asarray(st_ref.params.opacity_logit),
                               atol=1e-5)
