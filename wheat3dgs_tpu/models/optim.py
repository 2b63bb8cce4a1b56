"""Hand-rolled Adam with per-leaf learning rates and moment surgery.

The reference relies on torch.optim.Adam(eps=1e-15) with one param group per
tensor (scene/gaussian_model.py:167-186) and *edits optimizer state in place*
during densification (zeroed moments for new Gaussians, dropped moments for
pruned ones, scene/gaussian_model.py:295-360). A plain optax.adam hides its
moments behind the transform; here the moments are ordinary pytree leaves in
AdamState so densify/prune can mask them with the same scatter ops as the
params. Semantics match torch Adam (bias correction by global step count).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: Any          # first moments, same pytree as params
    nu: Any          # second moments
    step: jnp.ndarray  # () int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def adam_step(opt: AdamState, grads, params, lrs, b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-15):
    """One Adam update. ``lrs`` is a pytree of scalars matching params.

    Returns (new_params, new_opt).
    """
    step = opt.step + 1
    t = step.astype(jnp.float32)
    c1 = 1.0 - b1 ** t
    c2 = 1.0 - b2 ** t

    def upd(p, g, m, v, lr):
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * (g * g)
        return p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(opt.mu)
    flat_v = treedef.flatten_up_to(opt.nu)
    flat_lr = treedef.flatten_up_to(lrs)
    out = [upd(p, g, m, v, lr) for p, g, m, v, lr in
           zip(flat_p, flat_g, flat_m, flat_v, flat_lr)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_m = treedef.unflatten([o[1] for o in out])
    new_v = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_m, nu=new_v, step=step)
