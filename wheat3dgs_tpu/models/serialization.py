"""GaussianState <-> disk: reference-compatible PLY + npz checkpoints.

PLY layout is bit-compatible with the reference save_ply/load_ply
(scene/gaussian_model.py:196-293): float32 properties
x,y,z,nx,ny,nz,f_dc_0..2,f_rest_*,opacity,scale_*,rot_*, plus the wheat
`which_object` channel (stored f4, :212-218). f_rest is flattened
channel-major ((N, K-1, 3) -> transpose -> (N, 3*(K-1))) exactly as torch's
`transpose(1, 2).flatten(start_dim=1)`.

Checkpoints replace torch.save((capture(), iteration)) with a flat npz of the
full pytree (params + Adam moments + masks + stats), restoring exactly
(reference capture/restore, scene/gaussian_model.py:63-99).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..io.ply import read_ply, write_ply
from .gaussians import GaussianParams, GaussianState, init_state


def save_ply(state: GaussianState, path: str) -> None:
    """Write only alive Gaussians, reference property order."""
    alive = np.asarray(state.alive)
    p = jax.tree.map(lambda x: np.asarray(x)[alive], state.params)
    inst = np.asarray(state.instance_id)[alive].astype("<f4")
    n = p.sh_rest.shape[0]
    k1 = p.sh_rest.shape[1] // 3

    props = {"x": p.means[:, 0], "y": p.means[:, 1], "z": p.means[:, 2],
             "nx": np.zeros(n, "<f4"), "ny": np.zeros(n, "<f4"),
             "nz": np.zeros(n, "<f4")}
    for c in range(3):
        props[f"f_dc_{c}"] = p.sh_dc[:, c]
    # flat coeff-major (n, 3*k1) -> reference channel-major f_rest order
    rest = p.sh_rest.reshape(n, k1, 3).transpose(0, 2, 1).reshape(n, 3 * k1)
    for j in range(3 * k1):
        props[f"f_rest_{j}"] = rest[:, j]
    props["opacity"] = p.opacity_logit
    for c in range(3):
        props[f"scale_{c}"] = p.log_scales[:, c]
    for c in range(4):
        props[f"rot_{c}"] = p.quats[:, c]
    props["which_object"] = inst
    write_ply(path, {k: np.asarray(v, "<f4") for k, v in props.items()})


def load_ply(path: str, capacity: Optional[int] = None,
             remove_features_rest: bool = False
             ) -> Tuple[GaussianState, int]:
    """Read a (reference or ours) point_cloud.ply -> (state, sh_degree).

    remove_features_rest drops the SH rest bands for cheap viewing
    (reference viewer fork, wheat3dgsviewer/scene/gaussian_model.py:267-279).
    """
    v = read_ply(path)
    n = len(v["x"])
    means = np.stack([v["x"], v["y"], v["z"]], 1)
    sh_dc = np.stack([v[f"f_dc_{c}"] for c in range(3)], 1)
    rest_names = sorted((k for k in v if k.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    k1 = len(rest_names) // 3
    sh_degree = int(round(np.sqrt(k1 + 1))) - 1
    assert (sh_degree + 1) ** 2 - 1 == k1, \
        f"{path}: {len(rest_names)} f_rest bands do not match an SH degree"
    if remove_features_rest:
        k1 = 0
        sh_degree = 0
    if k1:
        rest = np.stack([v[nm] for nm in rest_names], 1).reshape(n, 3, k1)
        sh_rest = rest.transpose(0, 2, 1).reshape(n, 3 * k1)  # coeff-major
    else:
        sh_rest = np.zeros((n, 0), np.float32)
    log_scales = np.stack([v[f"scale_{c}"] for c in range(3)], 1)
    quats = np.stack([v[f"rot_{c}"] for c in range(4)], 1)
    opacity = v["opacity"]
    inst = v.get("which_object", np.zeros(n, np.float32)).astype(np.int32)

    params = GaussianParams(
        means=jnp.asarray(means, jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        log_scales=jnp.asarray(log_scales, jnp.float32),
        sh_dc=jnp.asarray(sh_dc, jnp.float32),
        sh_rest=jnp.asarray(sh_rest, jnp.float32),
        opacity_logit=jnp.asarray(opacity, jnp.float32))
    return init_state(params, instance_id=inst, capacity=capacity), sh_degree


def save_checkpoint(state: GaussianState, iteration: int, path: str) -> None:
    leaves, _ = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, iteration=iteration,
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_checkpoint(path: str, template: GaussianState) -> Tuple[GaussianState, int]:
    """Restore into the same tree structure (capacity must match)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(template)
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    return treedef.unflatten(restored), int(data["iteration"])
