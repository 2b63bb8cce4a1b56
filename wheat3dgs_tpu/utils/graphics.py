"""Camera / projection math (reference: utils/graphics_utils.py).

All functions are pure and operate on numpy or jax arrays. Conventions:

- World-to-camera matrices act on column vectors: ``x_cam = W2C @ x_world``.
- COLMAP stores a camera as (qvec, tvec) with ``x_cam = R(qvec) x_world + t``.
  The reference keeps ``R = R(qvec)^T`` (i.e. the C2W rotation) on the Camera
  and re-transposes inside getWorld2View2 (utils/graphics_utils.py:39-52);
  here we build W2C directly from the COLMAP rotation + translation.
- Projection is the OpenGL-style perspective matrix used by 3DGS
  (utils/graphics_utils.py:54-77): z_sign=+1, depth mapped to [0, 1],
  NDC x/y in [-1, 1].
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np


class BasicPointCloud(NamedTuple):
    points: np.ndarray  # (N, 3) float
    colors: np.ndarray  # (N, 3) float in [0, 1]
    normals: np.ndarray  # (N, 3) float


def qvec_to_rotmat(qvec: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> 3x3 rotation matrix."""
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> COLMAP (w, x, y, z) quaternion.

    Eigenvector-based method (reference: scene/colmap_loader.py:55-69).
    """
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def world_to_view(R_c2w: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """4x4 world-to-camera matrix.

    Mirrors getWorld2View2 (utils/graphics_utils.py:39-52): ``R_c2w`` is the
    camera-to-world rotation (COLMAP R^T as stored by the reference readers)
    and ``t`` the COLMAP translation; the camera center may be shifted and
    scaled (NeRF++-style normalization) before inverting back.
    """
    if translate is None:
        translate = np.zeros(3)
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R_c2w.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
    return np.linalg.inv(c2w)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective projection used by 3DGS (z in [0, 1])."""
    tan_x = math.tan(fovx * 0.5)
    tan_y = math.tan(fovy * 0.5)
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))
