"""EWA projection of 3D Gaussians to screen space (stage 1 of the rasterizer).

TPU-native replacement for the geometry half of the CUDA rasterizers
(reference: submodules/diff-gaussian-rasterization forward `preprocess`,
called from gaussian_renderer/__init__.py:84-99). Pure jnp, fully batched
over Gaussians, vmap-able over cameras; everything is differentiable and
static-shaped so XLA fuses it into a handful of elementwise kernels.

Conventions (matching the reference CUDA kernels):
- near-plane cull at view z <= 0.2;
- 2D covariance = J W Sigma W^T J^T with the t.x/t.z clamp at 1.3*tanfov,
  then +0.3 on the diagonal (screen-space dilation);
- radius = ceil(3 * sqrt(max eigenvalue)) in pixels;
- pixel coords via ndc2Pix: ((ndc + 1) * size - 1) / 2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils


class Splats2D(NamedTuple):
    """Screen-space Gaussians for one view. All arrays have leading dim N."""

    xy: jnp.ndarray        # (N, 2) pixel-space center
    depth: jnp.ndarray     # (N,) view-space z
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c)
    radius: jnp.ndarray    # (N,) int32 pixel radius, 0 = culled
    color: jnp.ndarray     # (N, C) RGB (or label channels)
    opacity: jnp.ndarray   # (N,) activated opacity in [0, 1]


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    opacities: jnp.ndarray,
    w2c: jnp.ndarray,
    full_proj: jnp.ndarray,
    cam_center: jnp.ndarray,
    tanfovx: jnp.ndarray,
    tanfovy: jnp.ndarray,
    width: int,
    height: int,
    sh: Optional[jnp.ndarray] = None,
    sh_degree: int = 3,
    colors: Optional[jnp.ndarray] = None,
    scale_modifier: float = 1.0,
    ndc_offset: Optional[jnp.ndarray] = None,
) -> Splats2D:
    """Project N Gaussians into one camera.

    Args:
      means3d: (N, 3). scales: (N, 3) activated. quats: (N, 4) unnormalized.
      opacities: (N,) activated.
      w2c/full_proj: (4, 4) acting on column vectors.
      sh: (N, K, 3) SH coefficients (used when ``colors`` is None).
      colors: (N, C) precomputed colors (label rendering path,
        reference render_helper.py:40-52).
      ndc_offset: optional (N, 2) zeros; gradients w.r.t. it reproduce the
        CUDA viewspace-point gradient convention (dL/d_ndc includes the
        0.5*W pixel scale) used for densification stats
        (reference: train_vanilla_3dgs.py:100-104).

    Returns:
      Splats2D with radius == 0 where culled.
    """
    means3d = jnp.asarray(means3d)
    opacities = jnp.asarray(opacities)
    n = means3d.shape[0]
    ones = jnp.ones((n, 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)            # (N, 4)

    t = hom @ w2c.T                                           # view space
    depth = t[:, 2]
    in_front = depth > 0.2

    p_hom = hom @ full_proj.T                                 # clip space
    # Culled points (w or z near 0) would produce inf/NaN *partials* that
    # poison the backward even under zero cotangents (0 * inf = NaN): route
    # their reciprocals through 1.0 instead.
    w_safe = jnp.where(in_front, p_hom[:, 3] + 1e-7, 1.0)
    p_w = 1.0 / w_safe
    ndc = p_hom[:, :2] * p_w[:, None]                         # (N, 2)
    if ndc_offset is not None:
        ndc = ndc + ndc_offset
    xy = jnp.stack(
        [((ndc[:, 0] + 1.0) * width - 1.0) * 0.5,
         ((ndc[:, 1] + 1.0) * height - 1.0) * 0.5], axis=1)

    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # EWA: J W Sigma W^T J^T with frustum-clamped t.
    lim_x = 1.3 * tanfovx
    lim_y = 1.3 * tanfovy
    tz = jnp.where(in_front, depth, 1.0)  # same inf-partial guard as above
    tx = jnp.clip(t[:, 0] / tz, -lim_x, lim_x) * tz
    ty = jnp.clip(t[:, 1] / tz, -lim_y, lim_y) * tz

    # 2D covariance fully elementwise: TPU lowers (N, 2, 3) @ (N, 3, 3)
    # batched small matmuls to tiny serialized MXU ops (~18 ms at 262k rows
    # measured); the expanded scalar forms below fuse into one VPU kernel.
    # cov3d = M M^T with M = R diag(s); cov2d = V V^T with V = (J W) M.
    W = w2c[:3, :3]
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # Dead capacity lanes hold all-zero quats, and norm() has a NaN
    # *backward* at 0 (q/|q|) that no post-hoc clamp can mask (0 * NaN =
    # NaN) — it would break jax_debug_nans (--detect_anomaly/--debug_from).
    # Substitute the identity quat on exactly-zero lanes BEFORE the norm:
    # live lanes (init |q|=1, never near zero) stay bit-identical to the
    # plain normalize, dead lanes get finite zero gradients through where().
    q_sq = jnp.sum(quats * quats, axis=1, keepdims=True)
    unit_w = jnp.zeros_like(quats).at[:, 0].set(1.0)
    q_safe = jnp.where(q_sq > 0.0, quats, unit_w)
    qn = q_safe / jnp.linalg.norm(q_safe, axis=1, keepdims=True)
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    sx_, sy_, sz_ = (scales[:, 0] * scale_modifier,
                     scales[:, 1] * scale_modifier,
                     scales[:, 2] * scale_modifier)
    # M[k][i] = R[k][i] * s_i (rotation rows scaled per column).
    m = [[(1.0 - 2.0 * (qy * qy + qz * qz)) * sx_,
          2.0 * (qx * qy - qw * qz) * sy_,
          2.0 * (qx * qz + qw * qy) * sz_],
         [2.0 * (qx * qy + qw * qz) * sx_,
          (1.0 - 2.0 * (qx * qx + qz * qz)) * sy_,
          2.0 * (qy * qz - qw * qx) * sz_],
         [2.0 * (qx * qz - qw * qy) * sx_,
          2.0 * (qy * qz + qw * qx) * sy_,
          (1.0 - 2.0 * (qx * qx + qy * qy)) * sz_]]
    # T[a][k] = (J W)[a][k]; J rows [fx/tz, 0, -fx tx/tz^2] and
    # [0, fy/tz, -fy ty/tz^2]; W entries are per-camera scalars.
    gx = focal_x * inv_tz
    gy = focal_y * inv_tz
    hx = focal_x * tx * inv_tz2
    hy = focal_y * ty * inv_tz2
    t_row = [[gx * W[0, k] - hx * W[2, k] for k in range(3)],
             [gy * W[1, k] - hy * W[2, k] for k in range(3)]]
    # V[a][i] = sum_k T[a][k] M[k][i]
    v = [[t_row[a][0] * m[0][i] + t_row[a][1] * m[1][i]
          + t_row[a][2] * m[2][i] for i in range(3)] for a in range(2)]
    a = v[0][0] * v[0][0] + v[0][1] * v[0][1] + v[0][2] * v[0][2] + 0.3
    b = v[0][0] * v[1][0] + v[0][1] * v[1][1] + v[0][2] * v[1][2]
    c = v[1][0] * v[1][0] + v[1][1] * v[1][1] + v[1][2] * v[1][2] + 0.3

    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=1)

    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Visibility: in front, invertible cov, and touching the image.
    visible = in_front & det_ok
    visible &= (xy[:, 0] + radius_f > 0) & (xy[:, 0] - radius_f < width)
    visible &= (xy[:, 1] + radius_f > 0) & (xy[:, 1] - radius_f < height)
    visible &= opacities > (1.0 / 255.0)
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    if colors is None:
        if sh is None:
            raise ValueError("either sh or colors must be given")
        dirs = means3d - cam_center[None, :]
        # same NaN-backward-at-zero guard as the quat normalize above
        d_sq = jnp.sum(dirs * dirs, axis=1, keepdims=True)
        dirs = jnp.where(d_sq > 0.0, dirs, jnp.ones_like(dirs))
        dirs = dirs / (jnp.linalg.norm(dirs, axis=1, keepdims=True) + 1e-9)
        color = sh_utils.sh_to_rgb(sh_degree, sh, dirs)
    else:
        color = jnp.asarray(colors)

    return Splats2D(xy=xy, depth=depth, conic=conic, radius=radius,
                    color=color, opacity=opacities)
