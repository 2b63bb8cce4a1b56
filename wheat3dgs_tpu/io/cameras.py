"""Cameras as batched arrays (reference: scene/cameras.py, utils/camera_utils.py).

TPU-first design: instead of one Python object per view holding device
tensors, a scene's cameras are a single pytree of stacked arrays (`Cameras`)
so that rendering can vmap over views and the whole batch can be sharded on a
mesh. Host-only metadata (image names, mask paths) lives in `CameraMeta`.

Conventions match the reference: znear=0.01, zfar=100
(scene/cameras.py:50-51); matrices act on column vectors here (the reference
stores transposes for torch row-vector bmm — observable results agree).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import graphics

ZNEAR = 0.01
ZFAR = 100.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Cameras:
    """A batch of pinhole cameras (all same resolution).

    Every field has a leading batch dim B; `width`/`height` are static.
    """

    w2c: jax.Array          # (B, 4, 4) world->camera
    full_proj: jax.Array    # (B, 4, 4) proj @ w2c
    cam_center: jax.Array   # (B, 3)
    tanfovx: jax.Array      # (B,)
    tanfovy: jax.Array      # (B,)
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    def __len__(self) -> int:
        return self.w2c.shape[0]

    def __getitem__(self, idx) -> "Cameras":
        return Cameras(
            w2c=self.w2c[idx], full_proj=self.full_proj[idx],
            cam_center=self.cam_center[idx], tanfovx=self.tanfovx[idx],
            tanfovy=self.tanfovy[idx], width=self.width, height=self.height)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tanfovy)


@dataclasses.dataclass
class CameraMeta:
    """Host-side per-view metadata."""

    uid: int
    colmap_id: int
    image_name: str
    image_path: Optional[str] = None
    bbox_path: Optional[str] = None
    mask_paths: Optional[List[str]] = None
    resolution_scale: float = 1.0
    R: Optional[np.ndarray] = None  # C2W rotation (COLMAP R^T), for JSON export
    T: Optional[np.ndarray] = None
    fovx: float = 0.0
    fovy: float = 0.0


def make_camera(R_c2w: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int,
                translate: np.ndarray | None = None, scale: float = 1.0) -> Cameras:
    """Build a single-view Cameras batch (B=1) from COLMAP-style pose."""
    return make_camera_batch([R_c2w], [t], [fovx], [fovy], width, height,
                             translate=translate, scale=scale)


def make_camera_batch(Rs: Sequence[np.ndarray], ts: Sequence[np.ndarray],
                      fovxs: Sequence[float], fovys: Sequence[float],
                      width: int, height: int,
                      translate: np.ndarray | None = None,
                      scale: float = 1.0) -> Cameras:
    B = len(Rs)
    w2c = np.zeros((B, 4, 4), dtype=np.float32)
    fp = np.zeros((B, 4, 4), dtype=np.float32)
    centers = np.zeros((B, 3), dtype=np.float32)
    tanx = np.zeros((B,), dtype=np.float32)
    tany = np.zeros((B,), dtype=np.float32)
    for i in range(B):
        m = graphics.world_to_view(Rs[i], ts[i], translate=translate, scale=scale)
        P = graphics.projection_matrix(ZNEAR, ZFAR, fovxs[i], fovys[i])
        w2c[i] = m.astype(np.float32)
        fp[i] = (P @ m).astype(np.float32)
        centers[i] = np.linalg.inv(m)[:3, 3].astype(np.float32)
        tanx[i] = math.tan(fovxs[i] * 0.5)
        tany[i] = math.tan(fovys[i] * 0.5)
    return Cameras(
        w2c=jnp.asarray(w2c), full_proj=jnp.asarray(fp),
        cam_center=jnp.asarray(centers), tanfovx=jnp.asarray(tanx),
        tanfovy=jnp.asarray(tany), width=int(width), height=int(height))


def make_camera_from_c2w(c2w: np.ndarray, fovx: float, fovy: float,
                         width: int, height: int) -> Cameras:
    """Camera from a camera-to-world matrix (synthetic/trajectory views,
    reference MiniCam, scene/cameras.py:100-111)."""
    w2c = np.linalg.inv(np.asarray(c2w, dtype=np.float64))
    R_c2w = w2c[:3, :3].T  # reference keeps the transposed rotation
    t = w2c[:3, 3]
    return make_camera(R_c2w, t, fovx, fovy, width, height)


def concat_cameras(cams: Sequence[Cameras]) -> Cameras:
    assert all(c.width == cams[0].width and c.height == cams[0].height for c in cams)
    return Cameras(
        w2c=jnp.concatenate([c.w2c for c in cams]),
        full_proj=jnp.concatenate([c.full_proj for c in cams]),
        cam_center=jnp.concatenate([c.cam_center for c in cams]),
        tanfovx=jnp.concatenate([c.tanfovx for c in cams]),
        tanfovy=jnp.concatenate([c.tanfovy for c in cams]),
        width=cams[0].width, height=cams[0].height)


def resolve_resolution(orig_w: int, orig_h: int, resolution: int,
                       resolution_scale: float = 1.0,
                       _warned=[False]) -> tuple:
    """Resolution policy (reference: utils/camera_utils.py:22-40).

    Returns ((w, h), total_scale). -1 auto-downscales >1.6K-wide images.
    """
    if resolution in (1, 2, 4, 8):
        res = (round(orig_w / (resolution_scale * resolution)),
               round(orig_h / (resolution_scale * resolution)))
        scale = float(resolution_scale) * float(resolution)
        return res, scale
    if resolution == -1:
        if orig_w > 1600:
            if not _warned[0]:
                print("[ INFO ] Large input images (>1.6K width); rescaling to 1.6K. "
                      "Use --resolution 1 to disable.")
                _warned[0] = True
            global_down = orig_w / 1600
        else:
            global_down = 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return (int(orig_w / scale), int(orig_h / scale)), scale


def camera_to_json(uid: int, meta: CameraMeta, width: int, height: int) -> dict:
    """Serialize for cameras.json (reference: utils/camera_utils.py:64-84)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = meta.R.transpose()
    Rt[:3, 3] = meta.T
    Rt[3, 3] = 1.0
    c2w = np.linalg.inv(Rt)
    return {
        "id": uid,
        "img_name": meta.image_name,
        "width": width,
        "height": height,
        "position": c2w[:3, 3].tolist(),
        "rotation": [row.tolist() for row in c2w[:3, :3]],
        "fy": graphics.fov2focal(meta.fovy, height),
        "fx": graphics.fov2focal(meta.fovx, width),
    }
