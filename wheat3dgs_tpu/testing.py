"""Synthetic scenes and cameras for tests and benchmarks.

The reference ships no automated tests (SURVEY.md §4); this module is the
fixture factory for the test pyramid we build instead: random-but-seeded
Gaussian clouds, a look-at camera, and a helper that runs the full
projection for one view.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .utils import graphics


@dataclasses.dataclass
class TestCamera:
    w2c: np.ndarray
    full_proj: np.ndarray
    cam_center: np.ndarray
    tanfovx: float
    tanfovy: float
    width: int
    height: int


def look_at_camera(width: int = 64, height: int = 48, fovx: float = 0.8,
                   eye=(0.0, 0.0, -4.0), target=(0.0, 0.0, 0.0),
                   znear: float = 0.01, zfar: float = 100.0) -> TestCamera:
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0.0, -1.0, 0.0])
    if abs(np.dot(up, fwd)) > 0.99:
        up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, fwd], axis=0)          # world->cam rotation
    t = -R @ eye
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    fovy = graphics.focal2fov(graphics.fov2focal(fovx, width), height)
    proj = graphics.projection_matrix(znear, zfar, fovx, fovy)
    return TestCamera(
        w2c=w2c.astype(np.float32),
        full_proj=(proj @ w2c).astype(np.float32),
        cam_center=eye.astype(np.float32),
        tanfovx=float(np.tan(fovx / 2)), tanfovy=float(np.tan(fovy / 2)),
        width=width, height=height)


def random_gaussians(n: int = 100, seed: int = 0, spread: float = 1.0,
                     scale_range=(0.02, 0.25), sh_degree: int = 0):
    """Seeded random cloud centered at the origin. Returns a dict of arrays."""
    rng = np.random.default_rng(seed)
    k = (sh_degree + 1) ** 2
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    return {
        "means3d": (rng.normal(size=(n, 3)) * spread).astype(np.float32),
        "scales": rng.uniform(*scale_range, size=(n, 3)).astype(np.float32),
        "quats": quats,
        "opacities": rng.uniform(0.2, 0.95, size=(n,)).astype(np.float32),
        "sh": rng.normal(size=(n, k, 3)).astype(np.float32) * 0.3,
        "colors": rng.uniform(0.0, 1.0, size=(n, 3)).astype(np.float32),
    }


def project_scene(g: dict, cam: TestCamera, use_colors: bool = False,
                  sh_degree: int = 0, ndc_offset=None):
    from .ops import projection

    return projection.project_gaussians(
        g["means3d"], g["scales"], g["quats"], g["opacities"],
        cam.w2c, cam.full_proj, cam.cam_center, cam.tanfovx, cam.tanfovy,
        cam.width, cam.height,
        sh=None if use_colors else g["sh"], sh_degree=sh_degree,
        colors=g["colors"] if use_colors else None, ndc_offset=ndc_offset)
