#!/usr/bin/env python
"""Interactive viewer entry point (reference:
wheat3dgsviewer/wheatgs_rendering.py): loads the trained scene +
all_obj_labels and serves the web viewer with per-head overlay and COLMAP
camera teleports. `singlewheat_rendering.py` is the no-overlay variant."""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from wheat3dgs_tpu import config as cfg
from wheat3dgs_tpu.render.pipeline import (RasterConfig, adapt_config,
                                            inference_config)
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.viewer import ViewerState, serve


def build_viewer(argv=None, with_overlay=True):
    parser = ArgumentParser()
    cfg.add_params(parser, cfg.ModelParams)
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--no_scale_filter", action="store_true")
    args = parser.parse_args(argv)
    model = cfg.extract(cfg.ModelParams, args)
    scene = Scene(model, load_iteration=-1, shuffle=False, load_images=False)

    obj_labels = None
    if with_overlay:
        labels_path = os.path.join(model.model_path, "wheat-head",
                                   args.exp_name, "all_obj_labels.pth")
        if os.path.exists(labels_path):
            from wheat3dgs_tpu.seg.pipeline import load_pt

            obj_labels = load_pt(labels_path).astype(bool)
            cap = scene.gaussians.capacity
            if obj_labels.shape[1] < cap:
                pad = np.zeros((obj_labels.shape[0],
                                cap - obj_labels.shape[1]), bool)
                obj_labels = np.concatenate([obj_labels, pad], axis=1)
        else:
            print(f"(no overlay: {labels_path} not found — run "
                  "render_360.py --render_type field first)")

    names, poses = [], []
    for split in ("train", "test"):
        group = scene.data.train if split == "train" else scene.data.test
        c = group.cameras
        for i, m in enumerate(group.metas):
            names.append(f"{split}:{m.image_name}")
            eye = np.asarray(c.cam_center[i])
            fwd = np.asarray(c.w2c[i])[2, :3]   # camera +z in world
            poses.append((eye, eye + fwd))

    vs = ViewerState(
        scene.gaussians, scene.sh_degree, width=args.width,
        height=args.height, obj_labels=obj_labels, camera_names=names,
        camera_poses=poses,
        scale_filter=None if args.no_scale_filter else 0.1,
        config=adapt_config(
            scene.gaussians, scene.cam_arrays("train", 0),
            args.width, args.height, inference_config(RasterConfig())))
    return vs, args


if __name__ == "__main__":
    vs, args = build_viewer(sys.argv[1:])
    serve(vs, port=args.port)
