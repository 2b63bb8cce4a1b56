"""Gaussian scene state: fixed-capacity pytree + masked densification.

TPU-native redesign of the reference GaussianModel (scene/gaussian_model.py):
instead of mutable torch tensors that are re-allocated by clone/split/prune
every 100 iterations (scene/gaussian_model.py:295-459), the state is a
fixed-capacity pytree of arrays with an `alive` mask. Densify/prune become
jit-compiled scatter ops; the arrays only grow (host-side re-pad + re-jit)
when free capacity runs out, amortized by doubling.

Field map to the reference (scene/gaussian_model.py:51-61):
  means <- _xyz, sh_dc <- _features_dc, sh_rest <- _features_rest,
  log_scales <- _scaling, quats <- _rotation, opacity_logit <- _opacity,
  instance_id <- _which_object (int channel carried through save/load),
  grad_accum/denom <- xyz_gradient_accum/denom, max_radii2d <- max_radii2D.
Activations match: exp / sigmoid / L2-normalized quats
(scene/gaussian_model.py:26-41).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import knn_mean_sq_dist
from ..utils.general import inverse_sigmoid, quat_to_rotmat
from ..utils.sh import num_sh_bands, rgb_to_sh
from .optim import AdamState, adam_init


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Optimized parameters. Leading dim = static capacity C."""

    means: jax.Array          # (C, 3)
    quats: jax.Array          # (C, 4) unnormalized (w, x, y, z)
    log_scales: jax.Array     # (C, 3)
    # SH coefficients in FLAT 2-D storage [k0_rgb, k1_rgb, ...]: rank-3
    # (C, K, 3) arrays lane-pad 3 -> 128 in some XLA/TPU layouts, which
    # measured ~12 ms/step of padded copies in the training backward.
    sh_dc: jax.Array          # (C, 3)
    sh_rest: jax.Array        # (C, 3*(K-1))
    opacity_logit: jax.Array  # (C,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    params: GaussianParams
    adam: AdamState           # moments shaped like params
    alive: jax.Array          # (C,) bool
    instance_id: jax.Array    # (C,) int32 wheat-head id, 0 = unassigned
    grad_accum: jax.Array     # (C,) float32 accumulated |viewspace grad|
    denom: jax.Array          # (C,) float32 visibility counts
    max_radii2d: jax.Array    # (C,) float32 max screen radius seen

    @property
    def capacity(self) -> int:
        return self.params.means.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return self.alive.sum()

    def opacity(self) -> jax.Array:
        """Activated opacity, zero for dead slots (dead slots never render)."""
        return jnp.where(self.alive,
                         jax.nn.sigmoid(self.params.opacity_logit), 0.0)

    def scales(self) -> jax.Array:
        return jnp.exp(self.params.log_scales)

    def sh(self) -> jax.Array:
        """Flat (C, 3K) coefficients ([k0_rgb, k1_rgb, ...])."""
        return jnp.concatenate(
            [self.params.sh_dc, self.params.sh_rest], axis=1)


def _round_capacity(n: int) -> int:
    """Power-of-two up to 32k, then 32k steps: every per-Gaussian cost in
    the Pallas prologue (expansion, sorts, gradient reduction) scales with
    capacity * mtpg, so pow2 doubling's up-to-2x slack was measurably the
    largest single waste at the 100k-1M splat scale."""
    cap = 1024
    while cap < n and cap < 32768:
        cap *= 2
    if cap >= n:
        return cap
    return -(-n // 32768) * 32768


def init_state(params: GaussianParams, instance_id=None,
               capacity: Optional[int] = None) -> GaussianState:
    n = params.means.shape[0]
    cap = capacity or _round_capacity(int(n * 1.25))
    if cap < n:
        raise ValueError(f"capacity {cap} < {n} points")

    def pad(x):
        return jnp.pad(jnp.asarray(x), [(0, cap - n)] + [(0, 0)] * (x.ndim - 1))

    params = jax.tree.map(pad, params)
    # Dead slots need a valid (non-zero) quaternion: their covariance is
    # still *computed* (then masked), and a zero quat's normalization has
    # NaN partials that would poison the backward.
    params = dataclasses.replace(
        params, quats=params.quats.at[n:, 0].set(1.0))
    alive = jnp.arange(cap) < n
    if instance_id is None:
        instance_id = jnp.zeros((cap,), jnp.int32)
    else:
        instance_id = pad(jnp.asarray(instance_id, jnp.int32))
    # Distinct buffers per field — aliased leaves break jit buffer donation.
    return GaussianState(params=params, adam=adam_init(params), alive=alive,
                         instance_id=instance_id,
                         grad_accum=jnp.zeros((cap,), jnp.float32),
                         denom=jnp.zeros((cap,), jnp.float32),
                         max_radii2d=jnp.zeros((cap,), jnp.float32))


def create_from_pcd(points: np.ndarray, colors: np.ndarray, sh_degree: int,
                    capacity: Optional[int] = None) -> GaussianState:
    """Initialize from a COLMAP point cloud
    (reference create_from_pcd, scene/gaussian_model.py:138-165)."""
    n = points.shape[0]
    k = num_sh_bands(sh_degree)
    means = jnp.asarray(points, jnp.float32)
    sh_dc = jnp.asarray(rgb_to_sh(np.asarray(colors)), jnp.float32)
    sh_rest = jnp.zeros((n, 3 * (k - 1)), jnp.float32)
    dist2 = jnp.maximum(knn_mean_sq_dist(means), 1e-7)
    log_scales = jnp.broadcast_to(
        jnp.log(jnp.sqrt(dist2))[:, None], (n, 3))
    quats = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opacity_logit = jnp.full((n,), float(inverse_sigmoid(0.1)), jnp.float32)
    params = GaussianParams(means=means, quats=quats, log_scales=log_scales,
                            sh_dc=sh_dc, sh_rest=jnp.asarray(sh_rest),
                            opacity_logit=opacity_logit)
    return init_state(params, capacity=capacity)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side: re-pad every per-Gaussian leaf to a larger capacity."""
    cap = state.capacity
    assert new_capacity > cap

    def pad(x):
        if x.ndim == 0:
            return x
        return jnp.pad(x, [(0, new_capacity - cap)] + [(0, 0)] * (x.ndim - 1))

    return GaussianState(
        params=jax.tree.map(pad, state.params),
        adam=AdamState(mu=jax.tree.map(pad, state.adam.mu),
                       nu=jax.tree.map(pad, state.adam.nu),
                       step=state.adam.step),
        alive=pad(state.alive), instance_id=pad(state.instance_id),
        grad_accum=pad(state.grad_accum), denom=pad(state.denom),
        max_radii2d=pad(state.max_radii2d))


# ---------------------------------------------------------------------------
# Densification (reference scene/gaussian_model.py:399-459)
# ---------------------------------------------------------------------------


def add_densification_stats(state: GaussianState, ndc_grad: jax.Array,
                            radii: jax.Array) -> GaussianState:
    """Accumulate screen-space gradient norms for visible Gaussians
    (reference :461-463; visibility = radii > 0)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(ndc_grad[:, :2], axis=-1)
    return dataclasses.replace(
        state,
        grad_accum=state.grad_accum + jnp.where(visible, gnorm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.maximum(state.max_radii2d,
                                jnp.where(visible, radii.astype(jnp.float32),
                                          0.0)))


def _scatter_params(params: GaussianParams, targets: jax.Array,
                    src: GaussianParams) -> GaussianParams:
    """Write src rows at target slots (out-of-range targets dropped)."""
    return jax.tree.map(
        lambda p, s: p.at[targets].set(s, mode="drop"), params, src)


def _gather_params(params: GaussianParams, idx: jax.Array) -> GaussianParams:
    return jax.tree.map(lambda p: p[idx], params)


def densify_and_prune(
    state: GaussianState,
    rng: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float = 0.01,
) -> tuple[GaussianState, Dict[str, jax.Array]]:
    """Clone small high-grad Gaussians, split big ones, prune transparent /
    oversized ones — all as masked scatters at fixed capacity.

    Matches densify_and_prune (scene/gaussian_model.py:441-459):
      clone:  grad >= thresh and max(scale) <= percent_dense * extent
      split:  grad >= thresh and max(scale) >  percent_dense * extent,
              2 samples ~ N(0, scale) rotated, scales /= 1.6, original dies
      prune:  opacity < min_opacity, or (when max_screen_size > 0)
              max(scale) > 0.1 * extent

    NOTE on the screen-radius prune: the reference's `big_points_vs =
    max_radii2D > max_screen_size` (scene/gaussian_model.py:455-457) reads
    a max_radii2D that `densification_postfix` has ALREADY zeroed for every
    point (scene/gaussian_model.py:397 — postfix runs inside
    densify_and_clone/split, before the prune mask is built), so it never
    fires in the reference. Round 1 pruned on the *accumulated* radii
    instead, which drove the documented post-reset prune spiral (any splat
    eventually exceeds 20px in some view on large scenes); matching the
    reference's actual behavior removes that failure mode.

    Returns (new_state, info) where info reports counts incl. `n_dropped`
    (requests that exceeded free capacity — host should grow_capacity).
    """
    cap = state.capacity
    p = state.params
    # max(denom, 1) keeps the dead lanes NaN-free so jax_debug_nans
    # (--detect_anomaly / --debug_from) can run over densify events; the
    # where() still zeroes them (reference zeroes NaNs after the fact,
    # scene/gaussian_model.py's densify_and_prune).
    grads = jnp.where(state.denom > 0,
                      state.grad_accum / jnp.maximum(state.denom, 1.0), 0.0)
    scales = jnp.exp(p.log_scales)
    max_scale = scales.max(axis=1)
    opacity = jax.nn.sigmoid(p.opacity_logit)

    prune_op = (opacity < min_opacity) & state.alive
    prune = prune_op
    if max_screen_size > 0:
        # world-size prune only; the reference's screen-radius prune is dead
        # code (see docstring) so it is intentionally absent here.
        prune = prune | ((max_scale > 0.1 * extent) & state.alive)

    hot = (grads >= grad_threshold) & state.alive & ~prune
    clone = hot & (max_scale <= percent_dense * extent)
    split = hot & (max_scale > percent_dense * extent)

    alive_after = state.alive & ~prune & ~split
    free = ~alive_after

    # Rank free slots / requests to pair them up.
    free_slot = jnp.where(free, jnp.arange(cap), cap)
    free_slot = jnp.sort(free_slot)                       # (cap,) free ids first
    n_free = free.sum()

    clone_rank = jnp.cumsum(clone) - 1                    # rank among clones
    n_clone = clone.sum()
    split_rank = jnp.cumsum(split) - 1
    n_split = split.sum()

    # Target slots; requests beyond free capacity get slot index cap (dropped).
    def slot_of(rank, valid):
        r = jnp.where(valid & (rank < n_free), rank, cap - 1)
        s = free_slot[jnp.minimum(r, cap - 1)]
        return jnp.where(valid & (rank < n_free), s, cap)

    clone_targets = slot_of(clone_rank, clone)
    split_base = n_clone + 2 * split_rank
    split_t0 = slot_of(split_base, split)
    split_t1 = slot_of(split_base + 1, split)

    src_idx = jnp.arange(cap)

    # --- clones: verbatim copies (zeroed moments & stats). ---
    new_params = _scatter_params(p, clone_targets, _gather_params(p, src_idx))

    # --- splits: 2 samples ~ N(0, scales) rotated into world frame. ---
    noise = jax.random.normal(rng, (2, cap, 3), jnp.float32)
    R = quat_to_rotmat(p.quats)                           # (cap, 3, 3)
    offsets = jnp.einsum("nij,snj->sni", R, noise * scales[None])
    split_scales = jnp.log(scales / (0.8 * 2.0))
    for s, targets in ((0, split_t0), (1, split_t1)):
        src = GaussianParams(
            means=p.means + offsets[s], quats=p.quats,
            log_scales=split_scales, sh_dc=p.sh_dc, sh_rest=p.sh_rest,
            opacity_logit=p.opacity_logit)
        new_params = _scatter_params(new_params, targets, src)

    # --- alive/instance/moments/stats bookkeeping. ---
    new_alive = alive_after
    inst = state.instance_id
    for targets in (clone_targets, split_t0, split_t1):
        ok = targets < cap
        new_alive = new_alive.at[targets].set(ok, mode="drop")
        inst = inst.at[targets].set(jnp.where(ok, state.instance_id, 0),
                                    mode="drop")

    dead_or_new = ~alive_after
    for targets in (clone_targets, split_t0, split_t1):
        dead_or_new = dead_or_new.at[targets].set(True, mode="drop")

    def clear(x):
        return jnp.where(
            dead_or_new.reshape((cap,) + (1,) * (x.ndim - 1)),
            jnp.zeros_like(x), x)

    new_adam = AdamState(mu=jax.tree.map(clear, state.adam.mu),
                         nu=jax.tree.map(clear, state.adam.nu),
                         step=state.adam.step)

    n_requested = n_clone + 2 * n_split
    info = {"n_clone": n_clone, "n_split": n_split,
            "n_pruned": prune.sum(), "n_pruned_opacity": prune_op.sum(),
            "n_dropped": jnp.maximum(0, n_requested - n_free),
            "n_alive": new_alive.sum()}
    return GaussianState(params=new_params, adam=new_adam, alive=new_alive,
                         instance_id=inst,
                         grad_accum=jnp.zeros((cap,), jnp.float32),
                         denom=jnp.zeros((cap,), jnp.float32),
                         max_radii2d=jnp.zeros((cap,), jnp.float32)), info


def reset_opacity(state: GaussianState) -> GaussianState:
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (reference reset_opacity + replace_tensor_to_optimizer,
    scene/gaussian_model.py:234-237,339-360)."""
    new_logit = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(state.params.opacity_logit), 0.01))
    params = dataclasses.replace(state.params, opacity_logit=new_logit)
    adam = AdamState(
        mu=dataclasses.replace(state.adam.mu,
                               opacity_logit=jnp.zeros_like(new_logit)),
        nu=dataclasses.replace(state.adam.nu,
                               opacity_logit=jnp.zeros_like(new_logit)),
        step=state.adam.step)
    return dataclasses.replace(state, params=params, adam=adam)


def prune_mask(state: GaussianState, kill: jax.Array) -> GaussianState:
    """Kill an arbitrary mask of Gaussians (used by the seg pipeline's
    per-head extraction, reference prune_points(during_training=False))."""
    alive = state.alive & ~kill
    return dataclasses.replace(state, alive=alive)
