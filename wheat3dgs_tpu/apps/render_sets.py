"""Render train/test camera sets to PNG trees (reference: render.py).

Output tree matches the reference so metrics.py and the eval tooling are
interchangeable: `<model>/{train,test}/ours_<iteration>/{renders,gt}/NNNNN.png`.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..render.pipeline import (RasterConfig, adapt_config,
                               inference_config, render_fwd_jit)
from ..scene import Scene


def save_png(path: str, chw: np.ndarray) -> None:
    from PIL import Image

    img = np.clip(np.asarray(chw), 0.0, 1.0)
    Image.fromarray((img.transpose(1, 2, 0) * 255).astype(np.uint8)).save(path)


def render_set(scene: Scene, split: str, iteration: int, sh_degree: int,
               bg, config: RasterConfig) -> int:
    group = scene.data.train if split == "train" else scene.data.test
    n = len(group.metas)
    if n == 0:
        return 0
    base = os.path.join(scene.model_path, split, f"ours_{iteration}")
    renders_dir = os.path.join(base, "renders")
    gt_dir = os.path.join(base, "gt")
    os.makedirs(renders_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    w, h = group.cameras.width, group.cameras.height
    # Flip to the TPU backend FIRST so adapt_config tunes the knobs the
    # Pallas path actually uses; probe the entry budget over ALL views of
    # the split so no view's render can silently crop entries.
    config = adapt_config(
        scene.gaussians, scene.cam_arrays(split, 0), w, h,
        inference_config(config),
        cams=[scene.cam_arrays(split, i) for i in range(n)])
    for i in range(n):
        out = render_fwd_jit(scene.gaussians, *scene.cam_arrays(split, i), w, h,
                     sh_degree=sh_degree, bg=bg, config=config)
        save_png(os.path.join(renders_dir, f"{i:05d}.png"), out.color)
        save_png(os.path.join(gt_dir, f"{i:05d}.png"), group.images[i])
    return n


def render_sets(model: cfg.ModelParams, iteration: int, skip_train: bool,
                skip_test: bool, config: RasterConfig = RasterConfig()):
    scene = Scene(model, load_iteration=iteration, shuffle=False)
    bg = jnp.ones(3, jnp.float32) if model.white_background else \
        jnp.zeros(3, jnp.float32)
    it = scene.loaded_iter
    if not skip_train:
        render_set(scene, "train", it, scene.sh_degree, bg, config)
    if not skip_test:
        render_set(scene, "test", it, scene.sh_degree, bg, config)
    return scene


def main(argv=None):
    parser = ArgumentParser(description="wheat3dgs_tpu render sets")
    cfg.add_params(parser, cfg.ModelParams, fill_none=True)
    cfg.add_params(parser, cfg.PipelineParams)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = cfg.get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    model = cfg.extract(cfg.ModelParams, args)
    render_sets(model, args.iteration, args.skip_train, args.skip_test)


if __name__ == "__main__":
    main(sys.argv[1:])
