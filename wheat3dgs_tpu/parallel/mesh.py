"""Device-mesh scale-out: plots x views data parallelism.

The reference is single-process/single-GPU; multi-GPU use is one SLURM job
per plot (run_wheat_3dgs.sh:7,23-28; SURVEY.md §2.9). The TPU-native design
makes that scale-out a first-class jit program over a
`jax.sharding.Mesh(("plot", "view"))`:

- the `plot` axis data-parallels independent scenes (each device group holds
  its own GaussianState slice — no cross-plot communication at all);
- the `view` axis shards the camera minibatch of each plot; XLA inserts the
  gradient psum over ICI automatically because the Gaussian state is
  replicated across `view`.

On one host this is validated with xla_force_host_platform_device_count; on
a real pod the same code lays plots on DCN-friendly outer dims and views on
ICI neighbours.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizationParams
from ..models.gaussians import GaussianState
from ..render.pipeline import RasterConfig
from ..training import multi_plot_step


def make_mesh(n_plots: int = 1, n_views: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_views is None:
        n_views = len(devices) // n_plots
    assert n_plots * n_views == len(devices), \
        f"{n_plots}x{n_views} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_plots, n_views)
    return Mesh(arr, ("plot", "view"))


def shard_states(mesh: Mesh, states: GaussianState) -> GaussianState:
    """states: pytree with leading P dim on every leaf -> shard P over
    'plot', replicate over 'view'."""
    sh = NamedSharding(mesh, P("plot"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def shard_plot(mesh: Mesh, tree):
    """(P, ...) arrays sharded on 'plot' only (replicated across 'view')."""
    sh = NamedSharding(mesh, P("plot"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_views(mesh: Mesh, tree):
    """(P, B, ...) camera/image arrays -> shard over ('plot', 'view')."""
    sh = NamedSharding(mesh, P("plot", "view"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def stack_states(states: Sequence[GaussianState]) -> GaussianState:
    """Stack per-plot states (equal capacity) into leading-P leaves."""
    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def build_multi_plot_trainer(mesh: Mesh, sh_degree: int, width: int,
                             height: int, opt: OptimizationParams,
                             config: RasterConfig = RasterConfig()):
    """Returns the jitted (states, cams..., gts, bg, it, extents) -> step fn
    for P plots x B views matching the mesh layout."""
    return multi_plot_step(sh_degree, width, height, opt, config)


# ---------------------------------------------------------------------------
# Gaussian-axis (capacity) sharding — memory headroom beyond plot/view DP
# ---------------------------------------------------------------------------
#
# SURVEY §5.7/§7: for scenes whose Gaussian state + Adam moments exceed one
# chip's HBM, shard the CAPACITY axis of every per-Gaussian leaf over a
# 'gauss' mesh axis. Parameters, moments, alive mask and densify stats stay
# resident-sharded (the memory that scales with N: ~708 B/splat at SH-3
# incl. both Adam moments); the rasterizer consumes a transient replicated
# copy of the ~64 B/splat projected rows, which XLA materializes with an
# all-gather over ICI and whose cotangent it returns to the shards with the
# transposed collective. The optimizer update and densification are
# per-slot elementwise/scan ops, so they run fully sharded with no
# communication beyond the free-slot cumsum.


def make_gauss_mesh(n_view: int = 1, n_gauss: Optional[int] = None,
                    devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_gauss is None:
        n_gauss = len(devices) // n_view
    assert n_view * n_gauss == len(devices), \
        f"{n_view}x{n_gauss} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(n_view, n_gauss)
    return Mesh(arr, ("view", "gauss"))


def shard_state_gauss(mesh: Mesh, state):
    """Shard the leading capacity axis of every per-Gaussian leaf over
    'gauss' (scalars like the Adam step stay replicated)."""

    def put(x):
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        assert x.shape[0] % mesh.shape["gauss"] == 0, (
            f"capacity {x.shape[0]} must divide the gauss axis "
            f"({mesh.shape['gauss']})")
        return jax.device_put(x, NamedSharding(mesh, P("gauss")))

    return jax.tree.map(put, state)


def build_gauss_sharded_trainer(mesh: Mesh, sh_degree: int, width: int,
                                height: int, opt: OptimizationParams,
                                config: RasterConfig = RasterConfig()):
    """Jitted (state, w2c, fp, cc, tfx, tfy, gts, bg, it) -> (state, metrics)
    over a ('view', 'gauss') mesh.

    The state arrives/leaves capacity-sharded over 'gauss'; the per-step
    view minibatch shards over 'view'. Inside the step the render path gets
    a replicated view of the parameters (with_sharding_constraint), so the
    tile compositing itself is untouched; XLA inserts the all-gather on the
    forward and the matching slice/reduce on the backward, plus the psum of
    view-sharded gradients into the replicated-by-view state.
    """
    from ..training import train_step_views

    state_spec = lambda x: P() if getattr(x, "ndim", 0) == 0 else P("gauss")

    def step(state, w2c, fp, cc, tfx, tfy, gts, bg, it):
        # Gather the param shards once per step for the render/grad path;
        # everything written back is constrained to the sharded layout.
        gathered = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P())), state)
        new_state, metrics = train_step_views.__wrapped__(
            gathered, w2c, fp, cc, tfx, tfy, gts, bg, it,
            sh_degree=sh_degree, width=width, height=height, opt=opt,
            config=config)
        new_state = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, state_spec(x))), new_state)
        return new_state, metrics

    # Input shardings are inherited from the arguments (the caller places
    # the state with shard_state_gauss and the minibatch with shard_views-
    # style device_puts); the constraints above pin the internal layout.
    return jax.jit(step, donate_argnums=(0,))
