"""Batched multi-plot training on a device mesh.

The reference trains plots 461-467 as separate SLURM jobs
(run_wheat_3dgs.sh:7,23-28); here all plots train in ONE jit program over a
('plot' x 'view') mesh — per-plot Gaussian states are stacked on a leading
axis sharded across 'plot', each step renders a view minibatch sharded
across 'view' (BASELINE.md scale-out target). Densify/prune runs vmapped
across plots on the same schedule.

Usage:
  python -m wheat3dgs_tpu.apps.train_multi --source_base <dir-with-plot_*> \
      --model_base <out> --iterations 7000 [--views_per_step 2]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..models import gaussians as G
from ..models.serialization import save_ply
from ..parallel import mesh as M
from ..render.pipeline import RasterConfig
from ..scene import Scene
from ..training import multi_plot_step
from ..utils.general import seed_everything


def load_plots(source_paths, model_base, model_tpl: cfg.ModelParams,
               sh_degree: int):
    scenes = []
    for sp in source_paths:
        name = os.path.basename(os.path.normpath(sp))
        model = dataclasses.replace(
            model_tpl, source_path=sp,
            model_path=os.path.join(model_base, name))
        os.makedirs(model.model_path, exist_ok=True)
        cfg.save_cfg_args(model.model_path, model)
        scenes.append(Scene(model, sh_degree=sh_degree))
    # Common capacity so states stack.
    cap = max(s.gaussians.capacity for s in scenes)
    for s in scenes:
        if s.gaussians.capacity < cap:
            s.gaussians = G.grow_capacity(s.gaussians, cap)
    return scenes


def training(source_paths, model_base, opt: cfg.OptimizationParams,
             model_tpl: cfg.ModelParams, sh_degree: int = 3,
             views_per_step: int = 1, config: RasterConfig = RasterConfig(),
             log_every: int = 100, quiet: bool = False, seed: int = 0):
    scenes = load_plots(source_paths, model_base, model_tpl, sh_degree)
    n_plots = len(scenes)
    w, h = scenes[0].image_size
    for s in scenes:
        assert s.image_size == (w, h), "plots must share a resolution"

    # Mesh axes must divide the data: plot axis | n_plots, view axis |
    # views_per_step. Spare devices stay idle rather than break divisibility.
    n_dev = len(jax.devices())
    n_plot_dev = max(d for d in range(1, min(n_plots, n_dev) + 1)
                     if n_plots % d == 0 and n_dev % d == 0)
    rem = n_dev // n_plot_dev
    n_view_dev = max(d for d in range(1, min(views_per_step, rem) + 1)
                     if views_per_step % d == 0)
    mesh = M.make_mesh(
        n_plots=n_plot_dev, n_views=n_view_dev,
        devices=jax.devices()[:n_plot_dev * n_view_dev])
    if not quiet:
        print(f"mesh: {dict(mesh.shape)} over {n_dev} devices; "
              f"{n_plots} plots x {views_per_step} views/step @{w}x{h}")

    states = M.shard_states(mesh, M.stack_states(
        [s.gaussians for s in scenes]))
    # Camera/image banks are only plot-sharded (each step's view minibatch
    # is what shards across 'view').
    gts = M.shard_plot(mesh, jnp.stack(
        [jnp.asarray(s.data.train.images) for s in scenes]))  # (P, V, 3,H,W)
    fields = ("w2c", "full_proj", "cam_center", "tanfovx", "tanfovy")
    cam_stacks = [M.shard_plot(mesh, jnp.stack(
        [jnp.asarray(getattr(s.data.train.cameras, f)) for s in scenes]))
        for f in fields]
    extents = jnp.asarray([s.cameras_extent for s in scenes], jnp.float32)
    bg = jnp.ones(3, jnp.float32) if model_tpl.white_background else \
        jnp.zeros(3, jnp.float32)
    n_views = gts.shape[1]

    # max_screen_size drives Python control flow in densify_and_prune, so it
    # must be static: one jitted variant per schedule phase.
    def make_densify(ms):
        return jax.jit(jax.vmap(
            lambda st, key, ext: G.densify_and_prune(
                st, key, opt.densify_grad_threshold, 0.005, ext, ms,
                opt.percent_dense)))

    densify_v = {0.0: make_densify(0.0), 20.0: make_densify(20.0)}
    reset_v = jax.jit(jax.vmap(G.reset_opacity))

    step_cache = {}

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    log_path = os.path.join(model_base, "metrics_multi.jsonl")
    log_f = open(log_path, "a")
    active_sh = 0
    t0 = time.time()
    for it in range(1, opt.iterations + 1):
        if it % 1000 == 0 and active_sh < sh_degree:
            active_sh += 1
        if active_sh not in step_cache:
            step_cache[active_sh] = multi_plot_step(active_sh, w, h, opt,
                                                    config)
        vi = rng.integers(n_views, size=(n_plots, views_per_step))
        vsel = jnp.asarray(vi)
        args = [jnp.take_along_axis(
            c, vsel.reshape(n_plots, views_per_step,
                            *([1] * (c.ndim - 2))), axis=1)
            for c in cam_stacks]
        gsel = jnp.take_along_axis(
            gts, vsel.reshape(n_plots, views_per_step, 1, 1, 1), axis=1)
        args = M.shard_views(mesh, tuple(args))
        gsel = M.shard_views(mesh, gsel)
        states, metrics = step_cache[active_sh](
            states, *args, gsel, bg, jnp.int32(it), extents)

        if it < opt.densify_until_iter:
            if (it > opt.densify_from_iter
                    and it % opt.densification_interval == 0):
                max_screen = 20.0 if it > opt.opacity_reset_interval else 0.0
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, n_plots)
                states, info = densify_v[max_screen](states, keys, extents)
                if int(jnp.max(info["n_dropped"])) > 0 or int(
                        jnp.max(info["n_alive"])) > 0.9 * states.alive.shape[1]:
                    # Double the shared capacity: pad every per-Gaussian
                    # leaf (dims >= 2: [plot, cap, ...]) and re-shard.
                    def pad_cap(x):
                        if x.ndim < 2:
                            return x
                        return jnp.pad(
                            x, [(0, 0), (0, x.shape[1])]
                            + [(0, 0)] * (x.ndim - 2))

                    states = M.shard_states(mesh,
                                            jax.tree.map(pad_cap, states))
            if it % opt.opacity_reset_interval == 0 and it > 0:
                states = reset_v(states)

        if it % log_every == 0 or it == opt.iterations:
            loss = np.asarray(metrics["loss"])
            rec = {"iter": it, "loss": loss.tolist(),
                   "psnr": np.asarray(metrics["psnr"]).tolist(),
                   "n_alive": np.asarray(metrics["n_alive"]).tolist(),
                   "elapsed_s": time.time() - t0}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            if not quiet:
                print(f"[it {it}] loss {np.mean(loss):.4f} "
                      f"psnr {np.mean(rec['psnr']):.2f}", flush=True)

    # Save each plot's PLY from the stacked state.
    host_states = jax.device_get(states)
    for pi, scene in enumerate(scenes):
        st = jax.tree.map(lambda x: x[pi], host_states)
        out = os.path.join(scene.model_path, "point_cloud",
                           f"iteration_{opt.iterations}")
        os.makedirs(out, exist_ok=True)
        save_ply(st, os.path.join(out, "point_cloud.ply"))
    log_f.close()
    return scenes


def main(argv=None):
    parser = ArgumentParser(description="wheat3dgs_tpu multi-plot training")
    cfg.add_params(parser, cfg.OptimizationParams)
    parser.add_argument("--source_base", type=str, default=None,
                        help="directory containing plot_* scene folders")
    parser.add_argument("--source_paths", nargs="*", default=None)
    parser.add_argument("--model_base", type=str, required=True)
    parser.add_argument("--sh_degree", type=int, default=3)
    parser.add_argument("--resolution", "-r", type=int, default=1)
    parser.add_argument("--white_background", "-w", action="store_true")
    parser.add_argument("--views_per_step", type=int, default=1)
    parser.add_argument("--max_per_tile", type=int, default=512)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)
    seed_everything(0)

    if args.source_paths:
        sources = args.source_paths
    else:
        sources = sorted(
            os.path.join(args.source_base, d)
            for d in os.listdir(args.source_base) if d.startswith("plot_"))
    assert sources, "no plot_* scene folders found"
    opt = cfg.extract(cfg.OptimizationParams, args)
    model_tpl = cfg.ModelParams(resolution=args.resolution,
                                white_background=args.white_background)
    from ..render.pipeline import inference_config

    config = inference_config(RasterConfig(max_per_tile=args.max_per_tile))
    training(sources, args.model_base, opt, model_tpl,
             sh_degree=args.sh_degree, views_per_step=args.views_per_step,
             config=config, quiet=args.quiet)


if __name__ == "__main__":
    main(sys.argv[1:])
