"""3D instance segmentation CLI (reference: run_3d_seg.py __main__:394-407).

Loads the trained scene, builds the SegContext from the train split's
YOLO-SAM mask/bbox artifacts, and runs the find-&-match pipeline."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np

from .. import config as cfg
from ..io.synthetic import load_bboxes
from ..render.pipeline import RasterConfig
from ..scene import Scene
from ..seg.pipeline import SegContext, run_segmentation
from ..utils.general import seed_everything


def build_context(scene: Scene, config: RasterConfig) -> SegContext:
    group = scene.data.train
    w, h = group.cameras.width, group.cameras.height
    cams = (group.cameras.w2c, group.cameras.full_proj,
            group.cameras.cam_center, group.cameras.tanfovx,
            group.cameras.tanfovy)
    image_names, mask_paths, bboxes = [], [], []
    for m in group.metas:
        image_names.append(m.image_name)
        mask_paths.append(list(m.mask_paths or []))
        if m.bbox_path and os.path.exists(m.bbox_path):
            scale = m.resolution_scale or 1.0
            bboxes.append(load_bboxes(m.bbox_path) / scale)
        else:
            bboxes.append(np.zeros((0, 4), np.float32))
    return SegContext(state=scene.gaussians, cams=cams,
                      image_names=image_names, mask_paths=mask_paths,
                      bboxes=bboxes, width=w, height=h, config=config,
                      images=group.images)


def main(argv=None):
    parser = ArgumentParser(description="wheat3dgs_tpu 3D segmentation")
    cfg.add_params(parser, cfg.ModelParams)
    cfg.add_params(parser, cfg.PipelineParams)
    parser.add_argument("--load_iteration", default=-1, type=int)
    parser.add_argument("--exp_name", type=str, default="default")
    parser.add_argument("--iou_threshold", type=float, default=0.6)
    parser.add_argument("--max_per_tile", type=int, default=512)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)
    seed_everything(0)

    model = cfg.extract(cfg.ModelParams, args)
    scene = Scene(model, load_iteration=args.load_iteration, shuffle=False)
    print(f"Loaded iteration {scene.loaded_iter}: "
          f"{int(scene.gaussians.num_alive)} Gaussians")
    from ..render.pipeline import adapt_config, inference_config

    w0, h0 = scene.image_size
    n_train = len(scene.data.train.metas)
    config = adapt_config(
        scene.gaussians, scene.cam_arrays("train", 0), w0, h0,
        inference_config(RasterConfig(max_per_tile=args.max_per_tile)),
        cams=[scene.cam_arrays("train", i) for i in range(n_train)])
    ctx = build_context(scene, config)

    test_group = scene.data.test
    eval_names = [m.image_name for m in test_group.metas]
    eval_cams = None
    if eval_names:
        c = test_group.cameras
        eval_cams = (c.w2c, c.full_proj, c.cam_center, c.tanfovx, c.tanfovy)

    summary = run_segmentation(
        ctx, model.model_path, args.exp_name,
        iou_threshold=args.iou_threshold, eval_names=eval_names,
        eval_cams=eval_cams, verbose=not args.quiet)
    print(f"Identified {summary['num_heads']} wheat heads -> "
          f"{summary['out_dir']}")
    return summary


if __name__ == "__main__":
    main(sys.argv[1:])
