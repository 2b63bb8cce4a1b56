#!/usr/bin/env python
"""Minimal training variant (reference: test.py — C2 in SURVEY.md):
same loop as train_vanilla_3dgs but no checkpoint-resume/metrics-log frills,
and cameras are drawn WITHOUT replacement per epoch (the reference pops from
a re-filled stack, test.py:36-38, vs. sample-with-replacement in the main
trainer)."""

import random
import sys
from argparse import ArgumentParser

import jax.numpy as jnp

from wheat3dgs_tpu import config as cfg
from wheat3dgs_tpu.scene import Scene
from wheat3dgs_tpu.training import Trainer
from wheat3dgs_tpu.utils.general import seed_everything


def training(model, opt, pipe, saving_iterations, quiet=False):
    scene = Scene(model, sh_degree=model.sh_degree)
    width, height = scene.image_size
    trainer = Trainer(scene.gaussians, opt, scene.cameras_extent,
                      sh_degree=model.sh_degree,
                      white_background=model.white_background)
    gt_images = jnp.asarray(scene.data.train.images)
    stack = []
    ema = 0.0
    for it in range(1, opt.iterations + 1):
        if not stack:
            stack = list(range(gt_images.shape[0]))
        vi = stack.pop(random.randint(0, len(stack) - 1))
        m = trainer.step(it, scene.cam_arrays("train", vi), gt_images[vi],
                         width, height)
        if it % 10 == 0:
            ema = 0.6 * ema + 0.4 * float(m["loss"])
            if not quiet and it % 100 == 0:
                print(f"[{it}] ema loss {ema:.5f} "
                      f"alive {int(m['n_alive'])}", flush=True)
        if it in saving_iterations:
            scene.save(it, trainer.state)
    scene.save(opt.iterations, trainer.state)
    return trainer, scene


def main(argv=None):
    parser = ArgumentParser(description="minimal training script")
    cfg.add_params(parser, cfg.ModelParams)
    cfg.add_params(parser, cfg.OptimizationParams)
    cfg.add_params(parser, cfg.PipelineParams)
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 15_000])
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)
    seed_everything(0)
    from wheat3dgs_tpu.apps.train_vanilla import prepare_output

    model = prepare_output(cfg.extract(cfg.ModelParams, args))
    training(model, cfg.extract(cfg.OptimizationParams, args),
             cfg.extract(cfg.PipelineParams, args),
             set(args.save_iterations), quiet=args.quiet)


if __name__ == "__main__":
    main(sys.argv[1:])
