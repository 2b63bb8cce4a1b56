"""Multi-plot mesh training app tests (8-device CPU mesh).

Covers the main branches of apps/train_multi.py: the plot x view mesh
factoring, divergent per-plot densification, the shared-capacity growth
(pad_cap) path, the opacity-reset + size-prune schedule branches, and both
CLI source selectors.
"""

import json
import os

import numpy as np
import pytest


def _make_plots(base, pids, **kw):
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    for pid, extra in pids.items():
        make_synthetic_colmap_scene(
            str(base / f"plot_{pid}"), plot_id=pid, width=64, height=48,
            seed=pid, with_masks=False, **{**kw, **extra})


def _read_log(model_base):
    with open(os.path.join(model_base, "metrics_multi.jsonl")) as f:
        return [json.loads(line) for line in f]


@pytest.mark.slow
def test_train_multi_two_plots(tmp_path):
    from wheat3dgs_tpu.apps.train_multi import main as multi_main

    base = tmp_path / "plots"
    _make_plots(base, {461: {}, 462: {}}, n_heads=1, pts_per_head=40,
                ground_pts=160)
    model_base = str(tmp_path / "models")
    multi_main(["--source_base", str(base), "--model_base", model_base,
                "--iterations", "60", "--densify_from_iter", "20",
                "--densification_interval", "25",
                "--densify_until_iter", "55",
                "--opacity_reset_interval", "10000",
                "--sh_degree", "1", "--max_per_tile", "128",
                "--views_per_step", "2", "--quiet"])
    last = _read_log(model_base)[-1]
    assert len(last["loss"]) == 2          # one loss per plot
    assert all(np.isfinite(last["loss"]))
    assert np.mean(last["psnr"]) > 18.0    # both plots actually converged
    for pid in (461, 462):
        ply = os.path.join(model_base, f"plot_{pid}", "point_cloud",
                           "iteration_60", "point_cloud.ply")
        assert os.path.exists(ply)


@pytest.mark.slow
def test_train_multi_divergent_densify_and_capacity_growth(tmp_path):
    """Plots of very different sizes: an aggressive densify threshold must
    overflow the shared capacity (n_alive > the initial 1024-slot rounding)
    via the pad_cap growth branch, with per-plot counts diverging."""
    from wheat3dgs_tpu.apps.train_multi import main as multi_main
    from wheat3dgs_tpu.models.serialization import load_ply

    base = tmp_path / "plots"
    _make_plots(base, {461: {"ground_pts": 500, "pts_per_head": 60},
                       463: {"ground_pts": 120, "pts_per_head": 30}},
                n_heads=1)
    model_base = str(tmp_path / "models")
    multi_main(["--source_paths", str(base / "plot_461"),
                str(base / "plot_463"),
                "--model_base", model_base,
                "--iterations", "80", "--densify_from_iter", "10",
                "--densification_interval", "10",
                "--densify_until_iter", "80",
                "--densify_grad_threshold", "1e-9",   # clone/split everything
                "--opacity_reset_interval", "10000",
                "--sh_degree", "0", "--max_per_tile", "256", "--quiet"])
    last = _read_log(model_base)[-1]
    n_alive = last["n_alive"]
    # initial shared capacity is 1024 (both plots round up to it); exceeding
    # it proves the shared-capacity growth branch ran.
    assert max(n_alive) > 1024, n_alive
    # plots densify independently: counts diverge with scene size
    assert n_alive[0] > 1.5 * n_alive[1], n_alive
    assert all(np.isfinite(last["loss"]))
    for pid, expect_min in ((461, 1024), (463, 100)):
        st, _ = load_ply(os.path.join(
            model_base, f"plot_{pid}", "point_cloud", "iteration_80",
            "point_cloud.ply"))
        assert int(st.num_alive) >= expect_min


def test_train_multi_reset_and_size_prune_branches(tmp_path):
    """opacity reset fires mid-run and the post-reset densify uses the
    max_screen=20 variant; training stays finite and saves."""
    from wheat3dgs_tpu.apps.train_multi import main as multi_main

    base = tmp_path / "plots"
    _make_plots(base, {465: {}}, n_heads=1, pts_per_head=40, ground_pts=160)
    model_base = str(tmp_path / "models")
    multi_main(["--source_base", str(base), "--model_base", model_base,
                "--iterations", "70", "--densify_from_iter", "10",
                "--densification_interval", "20",
                "--densify_until_iter", "65",
                "--opacity_reset_interval", "30",   # resets at 30, 60
                "--sh_degree", "0", "--max_per_tile", "128", "--quiet"])
    recs = _read_log(model_base)
    assert all(np.isfinite(r["loss"]).all() for r in recs)
    # population survives both resets (post-reset prune keeps the scene)
    assert recs[-1]["n_alive"][0] > 20
    assert os.path.exists(os.path.join(
        model_base, "plot_465", "point_cloud", "iteration_70",
        "point_cloud.ply"))


def test_train_multi_odd_plot_count_mesh_factoring(tmp_path):
    """3 plots on 8 devices: plot axis falls back to 1 (3 does not divide
    8), the view axis picks up the parallelism, and all plots still train."""
    from wheat3dgs_tpu.apps.train_multi import main as multi_main

    base = tmp_path / "plots"
    _make_plots(base, {461: {}, 462: {}, 463: {}}, n_heads=1,
                pts_per_head=30, ground_pts=120)
    model_base = str(tmp_path / "models")
    multi_main(["--source_base", str(base), "--model_base", model_base,
                "--iterations", "30", "--densify_from_iter", "1000",
                "--opacity_reset_interval", "10000",
                "--sh_degree", "0", "--max_per_tile", "128",
                "--views_per_step", "2", "--quiet"])
    last = _read_log(model_base)[-1]
    assert len(last["loss"]) == 3
    assert all(np.isfinite(last["loss"]))
