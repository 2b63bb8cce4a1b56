"""360° turntable videos (reference: render_360.py).

--render_type field: rebuild per-Gaussian labels from saved 2DSeg maps,
save all_counts.pth/all_obj_labels.pth, orbit the field at half resolution
with the depth-resolved per-head overlay -> wheat_field_360.mp4.
--render_type head: per wh_*.ply closeup turntable (1/3 res, FoV/5) ->
per-head mp4. Frame rendering is jitted; muxing uses utils.video (no ffmpeg
binary in this sandbox).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..models.serialization import load_ply
from ..render.camera_paths import (c2ws_to_camera_arrays,
                                   camera_path_fixed_elevation)
from ..render.pipeline import RasterConfig, render_fwd_jit
from ..scene import Scene
from ..seg.eval import eval_obj_labels, labels_from_seg_maps
from ..seg.pipeline import load_pt, save_pt
from ..utils import image_ops
from ..utils.video import write_video


def _fov_from_cameras(cams):
    fovx = 2.0 * math.atan(float(cams.tanfovx[0]))
    fovy = 2.0 * math.atan(float(cams.tanfovy[0]))
    return fovx, fovy


def _orbit_frames(state, sh_degree, c2ws, fovx, fovy, width, height, bg,
                  config, obj_labels=None, save_dir=None):
    cam_arrays = c2ws_to_camera_arrays(c2ws, fovx, fovy)
    frames = []
    labels = jnp.asarray(obj_labels) if obj_labels is not None else None

    def dispatch(i):
        """Enqueue frame i's device work WITHOUT blocking (JAX dispatch is
        async): the next frame renders while the host clips/overlays/encodes
        the previous one — a software pipeline over the single chip."""
        args = tuple(jnp.asarray(a[i]) for a in cam_arrays)
        out = render_fwd_jit(state, *args, width, height,
                             sh_degree=sh_degree, bg=bg, config=config)
        pred = (eval_obj_labels(state, labels, *args, width=width,
                                height=height, config=config)
                if labels is not None else None)
        return out, pred

    pending = dispatch(0) if len(c2ws) else None
    for i in range(len(c2ws)):
        nxt = dispatch(i + 1) if i + 1 < len(c2ws) else None
        out, pred = pending
        img = np.clip(np.asarray(out.color), 0, 1)    # sync point: frame i
        if pred is not None:
            rgb_mask = image_ops.visualize_obj(
                np.asarray(pred)).astype(np.float32) / 255.0
            img = image_ops.overlay_image(img, rgb_mask)
        frame = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        frames.append(frame)
        if save_dir is not None:
            from PIL import Image

            Image.fromarray(frame).save(
                os.path.join(save_dir, f"{i:05d}.png"))
        pending = nxt
    return frames


def render_wheat_field(model: cfg.ModelParams, exp_name: str,
                       n_frames: int = 100, framerate: int = 10,
                       elevation: float = 45, save_frames: bool = False,
                       load_iteration: int = -1,
                       config: RasterConfig = RasterConfig()):
    """reference render_wheat_field (render_360.py:139-188)."""
    scene = Scene(model, load_iteration=load_iteration, shuffle=False)
    base = os.path.join(model.model_path, "wheat-head", exp_name)
    out_dir = os.path.join(base, "3DSeg")
    os.makedirs(out_dir, exist_ok=True)
    bg = jnp.ones(3, jnp.float32) if model.white_background else \
        jnp.zeros(3, jnp.float32)
    w, h = scene.image_size
    cams = scene.data.train.cameras
    seg_maps = [load_pt(os.path.join(base, "2DSeg", f"{m.image_name}.pt"))
                for m in scene.data.train.metas]
    all_counts, obj_labels = labels_from_seg_maps(
        scene.gaussians, (cams.w2c, cams.full_proj, cams.cam_center,
                          cams.tanfovx, cams.tanfovy),
        seg_maps, w, h, config)
    save_pt(all_counts, os.path.join(base, "all_counts.pth"))
    save_pt(obj_labels, os.path.join(base, "all_obj_labels.pth"))

    alive = np.asarray(scene.gaussians.alive)
    centroid = np.asarray(scene.gaussians.params.means)[alive].mean(0)
    fovx, fovy = _fov_from_cameras(cams)
    c2ws = camera_path_fixed_elevation(
        n_frames, 1, camera_distance=scene.cameras_extent * 2,
        cam_center=centroid.tolist(), elevation=elevation)
    frames = _orbit_frames(scene.gaussians, scene.sh_degree, c2ws, fovx,
                           fovy, w // 2, h // 2, bg, config,
                           obj_labels=obj_labels,
                           save_dir=out_dir if save_frames else None)
    video = write_video(frames, os.path.join(base, "wheat_field_360.mp4"),
                        framerate)
    if not save_frames:
        shutil.rmtree(out_dir, ignore_errors=True)
    return video


def render_wheat_head(model: cfg.ModelParams, exp_name: str,
                      n_frames: int = 100, framerate: int = 10,
                      elevation: float = 15, save_frames: bool = False,
                      config: RasterConfig = RasterConfig()):
    """reference render_wheat_head (render_360.py:71-137): per-head closeup
    turntables at 1/3 resolution with FoV/5, white background."""
    scene = Scene(model, load_iteration=-1, shuffle=False, load_images=False)
    bg = jnp.ones(3, jnp.float32)
    cams = scene.data.train.cameras
    w, h = cams.width // 3, cams.height // 3
    fovx, fovy = _fov_from_cameras(cams)
    fovx, fovy = fovx / 5, fovy / 5

    ply_dir = os.path.join(model.model_path, "wheat-head", exp_name, "ply")
    out_base = os.path.join(os.path.dirname(ply_dir), "wheat_head_360")
    videos = []
    for ply_file in sorted(os.listdir(ply_dir)):
        stem = os.path.splitext(ply_file)[0]
        if not (ply_file.startswith("wh") and ply_file.endswith(".ply")):
            continue
        if len(stem.split("_")) > 2:   # skip letter-suffixed duplicates
            continue
        head_state, head_sh = load_ply(os.path.join(ply_dir, ply_file))
        alive = np.asarray(head_state.alive)
        if alive.sum() == 0:
            continue
        centroid = np.asarray(head_state.params.means)[alive].mean(0)
        ply_id = stem.replace("wh_", "", 1)
        frames_dir = os.path.join(out_base, ply_id)
        os.makedirs(frames_dir, exist_ok=True)
        c2ws = camera_path_fixed_elevation(
            n_frames, 1, camera_distance=scene.cameras_extent * 0.65,
            cam_center=centroid.tolist(), elevation=elevation)
        frames = _orbit_frames(head_state, head_sh, c2ws, fovx, fovy, w, h,
                               bg, config,
                               save_dir=frames_dir if save_frames else None)
        videos.append(write_video(
            frames, os.path.join(out_base, f"{ply_id}.mp4"), framerate))
        if not save_frames:
            shutil.rmtree(frames_dir, ignore_errors=True)
    return videos


def main(argv=None):
    parser = ArgumentParser(description="wheat3dgs_tpu 360 rendering")
    cfg.add_params(parser, cfg.ModelParams, fill_none=True)
    cfg.add_params(parser, cfg.PipelineParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--render_type", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--n_frames", type=int, default=100)
    parser.add_argument("--framerate", type=int, default=10)
    parser.add_argument("--elevation", type=int, default=45)
    parser.add_argument("--save_frames", action="store_true")
    args = cfg.get_combined_args(parser, argv)
    model = cfg.extract(cfg.ModelParams, args)
    print(f"Rendering {model.model_path} exp {args.exp_name} "
          f"type {args.render_type}")
    if args.render_type == "field":
        render_wheat_field(model, args.exp_name, args.n_frames,
                           args.framerate, args.elevation, args.save_frames,
                           args.iteration)
    elif args.render_type == "head":
        render_wheat_head(model, args.exp_name, args.n_frames,
                          args.framerate, args.elevation, args.save_frames)
    else:
        raise SystemExit("--render_type must be 'field' or 'head'")


if __name__ == "__main__":
    main(sys.argv[1:])
