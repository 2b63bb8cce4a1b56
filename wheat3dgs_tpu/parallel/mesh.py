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
