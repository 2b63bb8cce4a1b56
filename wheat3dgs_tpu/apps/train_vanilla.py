"""3DGS reconstruction training CLI (reference: train_vanilla_3dgs.py).

Same flags, schedule, and output tree as the reference entry point; the
compute is the jitted train step from wheat3dgs_tpu.training. wandb/TB are
replaced by a JSONL metrics log in the model dir (the sandbox has no wandb;
reference logging at train_vanilla_3dgs.py:34,117,145-180).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time
import uuid
from argparse import ArgumentParser

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..models.serialization import load_checkpoint, save_checkpoint
from ..ops.losses import psnr
from ..render.pipeline import RasterConfig, inference_config, render_jit
from ..scene import Scene
from ..training import Trainer
from ..utils.general import seed_everything


def prepare_output(model: cfg.ModelParams) -> cfg.ModelParams:
    if not model.model_path:
        model = __import__("dataclasses").replace(
            model, model_path=os.path.join("./output", str(uuid.uuid4())[:10]))
    os.makedirs(model.model_path, exist_ok=True)
    cfg.save_cfg_args(model.model_path, model)
    return model


def evaluate_test(scene: Scene, trainer: Trainer, config: RasterConfig):
    """PSNR over the test split (reference training_report,
    train_vanilla_3dgs.py:145-180)."""
    n = len(scene.data.test.metas)
    if n == 0:
        return None
    vals = []
    w, h = scene.data.test.cameras.width, scene.data.test.cameras.height
    for i in range(n):
        out = render_jit(trainer.state, *scene.cam_arrays("test", i), w, h,
                     sh_degree=trainer.active_sh_degree, bg=trainer.bg,
                     config=config)
        vals.append(float(psnr(jnp.clip(out.color, 0, 1),
                               scene.gt_image("test", i))))
    return float(np.mean(vals))


def training(model: cfg.ModelParams, opt: cfg.OptimizationParams,
             pipe: cfg.PipelineParams, test_iterations, save_iterations,
             checkpoint_iterations, start_checkpoint: str | None,
             quiet: bool = False, raster_config: RasterConfig | None = None,
             log_every: int = 100, profile: bool = False,
             debug_from: int = -1):
    model = prepare_output(model)
    scene = Scene(model, sh_degree=model.sh_degree)
    width, height = scene.image_size
    config = raster_config or RasterConfig()

    trainer = Trainer(scene.gaussians, opt, scene.cameras_extent,
                      sh_degree=model.sh_degree, config=config,
                      white_background=model.white_background)
    first_iter = 0
    if start_checkpoint:
        trainer.state, first_iter = load_checkpoint(start_checkpoint,
                                                    trainer.state)
        trainer.active_sh_degree = min(first_iter // 1000,
                                       trainer.max_sh_degree)

    gt_images = jnp.asarray(scene.data.train.images)   # (B, 3, H, W) device
    n_train = gt_images.shape[0]
    log_path = os.path.join(model.model_path, "metrics.jsonl")
    log_f = open(log_path, "a")
    tb = None
    try:  # TensorBoard scalars like the reference (train_vanilla_3dgs.py:145-180)
        from torch.utils.tensorboard import SummaryWriter

        tb = SummaryWriter(model.model_path)
    except Exception:
        pass

    rnd = random.Random(0)
    t0 = time.time()
    window_t0, window_it = t0, first_iter
    ema_loss = None
    profile_at = first_iter + 200 if profile else -1

    c = scene.data.train.cameras
    cam_stacks = (c.w2c, c.full_proj, c.cam_center, c.tanfovx, c.tanfovy)
    # Iterations a block may run THROUGH and end at (their side effects run
    # after the step, on the block-end `it`): log/densify/test/save/ckpt.
    end_events = (set(test_iterations) | set(save_iterations)
                  | set(checkpoint_iterations) | {opt.iterations})

    def block_len(it: int) -> int:
        """Steps runnable as ONE scanned device program starting at `it`.

        Ends AT the next log/densify/test/save/ckpt iteration (their host
        work runs on the block-end `it`), and BEFORE any SH-ramp multiple
        or the profile window (those must begin a block). 1 while
        profiling or with random background (per-step RNG)."""
        if opt.random_background or (
                profile and profile_at - 1 <= it <= profile_at + 20):
            return 1
        ends = [(it // log_every + 1) * log_every,
                (it // opt.densification_interval + 1)
                * opt.densification_interval,
                it + 49, opt.iterations]
        ends += [e for e in end_events if e >= it]
        if debug_from >= it:       # flip jax_debug_nans on a block boundary
            ends.append(debug_from)
        # strict starts: next SH multiple / profile start => end just before
        nxt_sh = (it // 1000 + 1) * 1000 if it % 1000 else it + 1000
        ends.append(nxt_sh - 1)
        if profile and profile_at > it:
            ends.append(profile_at - 1)
        return max(1, min(ends) - it + 1)

    it = first_iter + 1
    while it <= opt.iterations:
        # Reference train_vanilla_3dgs.py:68: rasterizer debug mode from
        # iteration debug_from+1 on; the TPU analogue is NaN anomaly checks.
        if debug_from >= 0 and it == debug_from + 1 \
                and not jax.config.jax_debug_nans:
            jax.config.update("jax_debug_nans", True)
        if it == profile_at:   # trace 20 steady-state steps (SURVEY.md §5.1)
            jax.profiler.start_trace(os.path.join(model.model_path,
                                                  "profile"))
        k = block_len(it)
        if k == 1:
            vi = rnd.randint(0, n_train - 1)  # sample w/ replacement (:65)
            metrics = trainer.step(it, scene.cam_arrays("train", vi),
                                   gt_images[vi], width, height)
        else:
            vis = [rnd.randint(0, n_train - 1) for _ in range(k)]
            metrics = trainer.step_block(it, vis, cam_stacks, gt_images,
                                         width, height, n_steps=k)
        it = it + k - 1
        if it == profile_at + 20 and profile:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
        if it % log_every == 0 or it == opt.iterations:
            loss = float(metrics["loss"])
            ema_loss = loss if ema_loss is None else 0.6 * ema_loss + 0.4 * loss
            now = time.time()
            ips = (it - window_it) / max(now - window_t0, 1e-9)
            window_t0, window_it = now, it
            rec = {"iter": it, "loss": loss, "ema_loss": ema_loss,
                   "psnr": float(metrics["psnr"]),
                   "n_alive": int(metrics["n_alive"]), "iters_per_sec": ips,
                   "capacity": trainer.state.capacity,
                   "max_per_tile": trainer.config.max_per_tile,
                   "mtpg": trainer.config.max_tiles_per_gauss}
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            if tb is not None:
                tb.add_scalar("train_loss_patches/total_loss", loss, it)
                tb.add_scalar("train/psnr", rec["psnr"], it)
                tb.add_scalar("total_points", rec["n_alive"], it)
                tb.add_scalar("iter_time", 1e3 / max(ips, 1e-9), it)
            if not quiet:
                print(f"[it {it:6d}] loss {loss:.4f} psnr {rec['psnr']:.2f} "
                      f"alive {rec['n_alive']} {ips:.1f} it/s", flush=True)
        if it in test_iterations:
            tp = evaluate_test(scene, trainer, config)
            if tp is not None:
                if not quiet:
                    print(f"[it {it}] TEST psnr {tp:.2f}", flush=True)
                log_f.write(json.dumps({"iter": it, "test_psnr": tp}) + "\n")
                log_f.flush()
                if tb is not None:
                    tb.add_scalar("test/psnr", tp, it)
        if it in save_iterations:
            scene.save(it, trainer.state)
        if it in checkpoint_iterations:
            save_checkpoint(trainer.state, it, os.path.join(
                model.model_path, f"chkpnt{it}.npz"))
        it += 1
    if opt.iterations not in save_iterations:
        scene.save(opt.iterations, trainer.state)
    log_f.close()
    if tb is not None:
        tb.close()
    total = time.time() - t0
    if not quiet:
        print(f"Training complete in {total:.1f}s "
              f"({(opt.iterations - first_iter) / max(total, 1e-9):.1f} it/s)")
    return trainer, scene


def main(argv=None):
    parser = ArgumentParser(description="wheat3dgs_tpu training")
    cfg.add_params(parser, cfg.ModelParams)
    cfg.add_params(parser, cfg.OptimizationParams)
    cfg.add_params(parser, cfg.PipelineParams)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 15_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace of 20 hot steps")
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--debug_from", type=int, default=-1,
                        help="iteration from which to enable NaN anomaly "
                             "detection (reference train_vanilla_3dgs.py:188"
                             " flips the rasterizer debug mode; the TPU "
                             "analogue is jax_debug_nans)")
    parser.add_argument("--max_per_tile", type=int, default=512)
    parser.add_argument("--max_tiles_per_gauss", type=int, default=16)
    args = parser.parse_args(argv)
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)
    seed_everything(0)

    model = cfg.extract(cfg.ModelParams, args)
    opt = cfg.extract(cfg.OptimizationParams, args)
    pipe = cfg.extract(cfg.PipelineParams, args)
    rconf = inference_config(RasterConfig(
        max_per_tile=args.max_per_tile,
        max_tiles_per_gauss=args.max_tiles_per_gauss))
    print(f"Optimizing {model.model_path or '(new output dir)'}")
    training(model, opt, pipe, set(args.test_iterations),
             set(args.save_iterations), set(args.checkpoint_iterations),
             args.start_checkpoint, quiet=args.quiet, raster_config=rconf,
             profile=args.profile, debug_from=args.debug_from)
    print("Training done.")


if __name__ == "__main__":
    main(sys.argv[1:])
