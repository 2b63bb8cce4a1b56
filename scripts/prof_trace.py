"""Capture a jax.profiler device trace of the full train-grad and print the
top HLO ops by device time (xprof xplane parsing — no TensorBoard UI)."""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache", "tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

TRACE_DIR = "/tmp/w3_trace"

# Reuse prof_step's scene/burn-in setup by importing it up to the bench defs
import runpy

ns = {}
import importlib.util

spec = importlib.util.spec_from_file_location(
    "prof_step_mod", os.path.join(os.path.dirname(__file__), "prof_step.py"))


def main():
    # Inline the minimal setup instead of importing prof_step (it runs rows).
    import time

    import jax.numpy as jnp
    import numpy as np

    from wheat3dgs_tpu.config import ModelParams, OptimizationParams
    from wheat3dgs_tpu.models.serialization import load_checkpoint
    from wheat3dgs_tpu.ops import pallas_raster as PR
    from wheat3dgs_tpu.ops.binning import pick_entry_budget
    from wheat3dgs_tpu.ops.losses import l1_loss, ssim
    from wheat3dgs_tpu.ops.projection import project_gaussians
    from wheat3dgs_tpu.render.pipeline import RasterConfig, inference_config
    from wheat3dgs_tpu.scene import Scene
    from wheat3dgs_tpu.training import Trainer, entry_demand_probe

    SCENE = os.environ.get("WHEAT3DGS_BENCH_SCENE",
                           os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache", "scene_100k"))
    CKPT = "/tmp/prof_burnin_state.npz"
    W, H, SH, TILE = 1600, 1200, 3, 32

    model = ModelParams(source_path=SCENE, model_path="", eval=True,
                        resolution=1)
    scene = Scene(model, sh_degree=SH, shuffle=False)
    from wheat3dgs_tpu.models.gaussians import grow_capacity

    tpl = scene.gaussians
    if tpl.capacity < 262144:
        tpl = grow_capacity(tpl, 262144)
    state, _ = load_checkpoint(CKPT, tpl)
    gt = jnp.asarray(scene.data.train.images[0])
    cam = scene.cam_arrays("train", 0)
    demand = int(entry_demand_probe(state, *cam, width=W, height=H))
    budget = pick_entry_budget(demand)
    print(f"budget={budget}", file=sys.stderr)

    def loss_fwd(params, state):
        import dataclasses

        s = dataclasses.replace(state, params=params)
        sp = project_gaussians(
            params.means, s.scales(), params.quats, s.opacity(), *cam, W, H,
            sh=s.sh(), sh_degree=SH)
        out = PR.rasterize_pallas(sp, W, H, tile=TILE, entry_budget=budget)
        return 0.8 * l1_loss(out.color, gt) + 0.2 * (1.0 - ssim(out.color, gt))

    full_grad = jax.jit(lambda st: jax.grad(loss_fwd)(st.params, st))
    g = full_grad(state)
    jax.block_until_ready(g)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            g = full_grad(state)
        jax.block_until_ready(g)
    print("trace captured", file=sys.stderr)

    report()


def report():
    from xprof.convert import raw_to_tool_data as rtd

    plane = sorted(glob.glob(
        os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    if not plane:
        print("no xplane found")
        return
    data, _ = rtd.xspace_to_tool_data(plane, "op_profile", {})
    import json

    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        out.append((m.get("selfTimePs", 0), node.get("name", "?")))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)

    rows = []
    walk(prof.get("byProgram", prof), 0, rows)
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print("top self-time ops:")
    for ps, name in rows[:40]:
        if ps <= 0:
            continue
        print(f"  {ps / 1e9 / 5:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    if os.environ.get("W3_REPORT_ONLY"):
        report()
    else:
        main()
