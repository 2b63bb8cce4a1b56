"""Small numeric helpers (reference: utils/general_utils.py).

Everything here is jnp-traceable so it can live inside jitted train steps —
in particular the log-lerp learning-rate schedule, which the reference
evaluates per-step on the host (utils/general_utils.py:29-62).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: float = 0.0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linearly interpolated (exponential-decay) LR, traced-friendly.

    Matches get_expon_lr_func semantics (utils/general_utils.py:29-62):
    lr(0) = lr_init, lr(max_steps) = lr_final, optional sine-eased delay.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Batched unnormalized (w, x, y, z) quaternion -> (..., 3, 3) rotation.

    Same normalization + element layout as build_rotation
    (utils/general_utils.py:78-100).
    """
    # eps guard: all-zero quats (dead capacity-padding slots) must not emit
    # NaN primals OR NaN partials (sqrt'(0) = inf would poison the backward
    # even under zero cotangents), hence rsqrt of a clamped sum-of-squares.
    import jax

    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [jnp.stack([r00, r01, r02], -1),
         jnp.stack([r10, r11, r12], -1),
         jnp.stack([r20, r21, r22], -1)], axis=-2)


def build_covariance(scales: jnp.ndarray, quats: jnp.ndarray,
                     scale_modifier: float = 1.0) -> jnp.ndarray:
    """3D covariance Sigma = (R S)(R S)^T from activated scales + quaternions.

    Reference: build_scaling_rotation + build_covariance_from_scaling_rotation
    (utils/general_utils.py:102-110, scene/gaussian_model.py:27-32).
    Returns full (..., 3, 3) symmetric matrices.
    """
    import jax

    R = quat_to_rotmat(quats)
    L = R * (scale_modifier * scales)[..., None, :]  # R @ diag(s)
    return jnp.matmul(L, jnp.swapaxes(L, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


def cov_to_sym6(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) covariance -> packed upper triangle (..., 6)."""
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def seed_everything(seed: int = 0) -> None:
    """Seed host-side RNGs (reference safe_state seeds 0,
    utils/general_utils.py:130-132). JAX randomness is explicit via keys."""
    import random

    random.seed(seed)
    np.random.seed(seed)
