"""Multi-plot mesh training app test (2 plots on the 8-device CPU mesh)."""

import os

import numpy as np


def test_train_multi_two_plots(tmp_path):
    from wheat3dgs_tpu.apps.train_multi import main as multi_main
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene

    base = tmp_path / "plots"
    for pid in (461, 462):
        make_synthetic_colmap_scene(
            str(base / f"plot_{pid}"), plot_id=pid, width=64, height=48,
            n_heads=1, pts_per_head=40, ground_pts=160, seed=pid,
            with_masks=False)
    model_base = str(tmp_path / "models")
    multi_main(["--source_base", str(base), "--model_base", model_base,
                "--iterations", "60", "--densify_from_iter", "20",
                "--densification_interval", "25",
                "--densify_until_iter", "55",
                "--opacity_reset_interval", "10000",
                "--sh_degree", "1", "--max_per_tile", "128",
                "--views_per_step", "2", "--quiet"])
    import json

    recs = [json.loads(l) for l in
            open(os.path.join(model_base, "metrics_multi.jsonl"))]
    last = recs[-1]
    assert len(last["loss"]) == 2          # one loss per plot
    assert all(np.isfinite(last["loss"]))
    assert np.mean(last["psnr"]) > 18.0    # both plots actually converged
    for pid in (461, 462):
        ply = os.path.join(model_base, f"plot_{pid}", "point_cloud",
                           "iteration_60", "point_cloud.ply")
        assert os.path.exists(ply)
