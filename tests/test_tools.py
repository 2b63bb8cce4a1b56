"""Tests for the host-side tool scripts (splitters, summarizer, vis_cam,
xlsx writer, network_gui decode)."""

import json
import os
import sys
import zipfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_transforms_split(tmp_path):
    from create_train_test_jsons import create_train_test_splits
    from create_transforms_with_splits import add_split_lists

    frames = [{"file_path": f"images/plot_000_{i:02d}.png",
               "transform_matrix": np.eye(4).tolist()} for i in range(1, 13)]
    tj = tmp_path / "transforms.json"
    tj.write_text(json.dumps({"fl_x": 100.0, "frames": frames}))

    res = create_train_test_splits(str(tj))
    train = json.load(open(res["train_path"]))
    test = json.load(open(res["test_path"]))
    assert len(train["frames"]) == 10 and len(test["frames"]) == 2
    assert train["fl_x"] == 100.0
    # reference also emits split.json for nerfstudio --data.split-path
    split = json.load(open(res["split_path"]))
    assert len(split["train"]) == 10 and len(split["test"]) == 2

    # reference default: a NEW <stem>_with_splits.json next to the input
    out = add_split_lists(str(tj))
    assert out.endswith("transforms_with_splits.json")
    data = json.load(open(out))
    assert len(data["train_filenames"]) == 10
    assert data["val_filenames"] == data["test_filenames"]
    assert json.load(open(tj))["frames"] == frames  # input untouched

    # reference CLI spelling (--transforms_json flag, --output_prefix)
    import subprocess, sys as _sys
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "create_train_test_jsons.py"),
         "--transforms_json", str(tj),
         "--output_prefix", str(tmp_path / "pfx")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "pfx_train.json").exists()
    assert (tmp_path / "pfx_split.json").exists()


def test_summarize_results(tmp_path):
    import summarize_results

    for plot, psnr in (("plot_461", 25.0), ("plot_462", 27.0)):
        d = tmp_path / plot
        d.mkdir()
        (d / "results.json").write_text(json.dumps(
            {"ours_15000": {"PSNR": psnr, "SSIM": 0.8, "LPIPS": None}}))
    out = tmp_path / "summary"
    summarize_results.main(["-b", str(tmp_path), "-o", str(out)])
    import pandas as pd

    df = pd.read_csv(out / "results_per_scene.csv")
    assert len(df) == 2
    assert df["psnr"].mean() == 26.0


def test_vis_cam(tmp_path):
    from wheat3dgs_tpu.io.synthetic import make_synthetic_colmap_scene
    import vis_cam

    scene = tmp_path / "scene"
    make_synthetic_colmap_scene(str(scene), width=48, height=36, n_heads=1,
                                pts_per_head=30, ground_pts=60,
                                with_masks=False)
    out = tmp_path / "cams.png"
    vis_cam.main(["-s", str(scene), "-o", str(out)])
    assert out.exists() and out.stat().st_size > 1000


def test_xlsx_writer_roundtrip(tmp_path):
    from wheat3dgs_tpu.utils.xlsx import write_xlsx

    path = str(tmp_path / "t.xlsx")
    write_xlsx(path, ["a", "b"], [[1, "x"], [2.5, "y&z"]])
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert "xl/worksheets/sheet1.xml" in names
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "2.5" in sheet and "y&amp;z" in sheet


def test_network_gui_camera_decode():
    """The SIBR message decodes into our column-vector convention."""
    from wheat3dgs_tpu.render import network_gui
    from wheat3dgs_tpu.testing import look_at_camera

    cam = look_at_camera(width=32, height=24)
    # Build the torch-style message: transposed matrices with Y/Z flip.
    w2c = cam.w2c.copy()
    w2c_t = w2c.T.copy()
    w2c_t[:, 1] = -w2c_t[:, 1]
    w2c_t[:, 2] = -w2c_t[:, 2]
    fp_t = cam.full_proj.T.copy()
    fp_t[:, 1] = -fp_t[:, 1]
    msg = {
        "resolution_x": 32, "resolution_y": 24, "train": False,
        "fov_x": 2 * np.arctan(cam.tanfovx), "fov_y": 2 * np.arctan(cam.tanfovy),
        "z_near": 0.01, "z_far": 100.0, "shs_python": False,
        "rot_scale_python": False, "keep_alive": True,
        "scaling_modifier": 1.0,
        "view_matrix": w2c_t.ravel().tolist(),
        "view_projection_matrix": fp_t.ravel().tolist(),
    }
    orig = network_gui._read_message
    network_gui._read_message = lambda: msg  # bypass the socket
    try:
        out_cam, train, _, _, keep, sm = network_gui.receive()
    finally:
        network_gui._read_message = orig
    np.testing.assert_allclose(out_cam["w2c"], cam.w2c, atol=1e-6)
    np.testing.assert_allclose(out_cam["cam_center"], cam.cam_center,
                               atol=1e-5)
    assert keep is True and sm == 1.0


def test_polygon_helpers():
    from wheat3dgs_tpu.utils.geometry2d import (find_best_match,
                                                intersection_area,
                                                nearest_k_viewpoints)

    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    half = np.array([[1, 0], [3, 0], [3, 2], [1, 2]], float)
    assert intersection_area(sq, half) == pytest_approx(2.0)
    far = half + 10
    _, idx = find_best_match(sq, [far, half])
    assert idx == 1
    _, idx = find_best_match(sq, [far, far + 5])   # no overlap -> nearest
    assert idx == 0
    centers = np.array([[0, 0, 0], [1, 0, 0], [5, 0, 0]], float)
    got = nearest_k_viewpoints(np.array([0.9, 0, 0]), centers, k=2)
    assert set(got.tolist()) == {0, 1}


def pytest_approx(v):
    import pytest

    return pytest.approx(v, rel=1e-6)


def test_bench_tpu_health_wait(monkeypatch):
    """bench.py must never hang on a wedged TPU attachment: the probe runs
    in a timeout-bounded subprocess and the wait gives up at its budget."""
    import subprocess
    import types

    import bench

    calls = {"n": 0}

    def fake_run(*a, **k):
        calls["n"] += 1
        return types.SimpleNamespace(returncode=0 if calls["n"] >= 2 else 1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_tpu_healthy(30.0)          # recovers on 2nd probe
    assert calls["n"] == 2

    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: types.SimpleNamespace(returncode=1))
    assert not bench.wait_tpu_healthy(0.0)       # budget exhausted -> False
