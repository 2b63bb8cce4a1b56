"""Morphology pipeline tests on synthetic head clouds."""

import json
import os
import zipfile

import numpy as np
import pytest

from wheat3dgs_tpu.io.ply import write_ply
from wheat3dgs_tpu.morphology import (compute_traits, extract_bounding_box,
                                      points_in_bbox, run_pipeline)


def synthetic_head(n=2000, length=0.2, radius=0.02, incline_deg=30.0,
                   seed=0):
    """Elongated noisy cylinder tilted from Z by incline_deg."""
    rng = np.random.default_rng(seed)
    t = rng.uniform(-0.5, 0.5, n) * length
    ang = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(0, radius, n)
    pts = np.stack([r * np.cos(ang), r * np.sin(ang), t], axis=1)
    th = np.deg2rad(incline_deg)
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]])
    return pts @ R.T + np.array([0.3, -0.2, 0.5])


def test_compute_traits_known_geometry():
    pts = synthetic_head()
    length, width, volume, inclination, curvature = compute_traits(
        pts, distance_percentile=99, splines_smoothing_value=1.0)
    assert length == pytest.approx(0.2, rel=0.15)
    assert width == pytest.approx(2 * 0.02, rel=0.6)
    # cylinder volume ~ pi r^2 L = 2.5e-4; convex hull of a filled cylinder
    assert 0.5e-4 < volume < 5e-4
    assert inclination == pytest.approx(30.0, abs=5.0) or \
        inclination == pytest.approx(150.0, abs=5.0)  # axis sign ambiguity
    assert 1.0 <= curvature < 1.2   # almost straight


def test_bbox_roundtrip():
    pts = synthetic_head(n=500)
    for oriented in (False, True):
        bbox = extract_bounding_box(pts, oriented=oriented)
        inside, mask = points_in_bbox(pts, bbox)
        assert mask.mean() > 0.99   # own points inside own box
    obb = extract_bounding_box(pts, oriented=True)
    aabb = extract_bounding_box(pts, oriented=False)
    obb_vol = np.prod(obb["extent"])
    aabb_vol = np.prod(np.asarray(aabb["max_bound"])
                       - np.asarray(aabb["min_bound"]))
    assert obb_vol <= aabb_vol * 1.05   # oriented box is tighter


def test_run_pipeline_end_to_end(tmp_path):
    data_dir = tmp_path / "heads"
    out_dir = tmp_path / "results"
    data_dir.mkdir()
    out_dir.mkdir()
    for i in range(3):
        pts = synthetic_head(n=1200, seed=i).astype("<f4")
        # sprinkle far outliers the SOR must remove
        outl = pts[:20] + 5.0
        allpts = np.concatenate([pts, outl])
        write_ply(str(data_dir / f"{i + 1:04d}.ply"),
                  {"x": allpts[:, 0], "y": allpts[:, 1], "z": allpts[:, 2]})

    cfg = {
        "data_folder": str(data_dir), "output_folder": str(out_dir),
        "file_format": "ply", "subsampling_threshold": 5000,
        "clusterer_definition": {"type": "dbscan", "epsilon": 0.05,
                                 "min_samples": 10},
        "sor_parameters": {"k": 50, "std_ratio": 3},
        "splines_smoothing_value": 1, "distance_percentile": 99,
        "get_bboxes": True, "get_processed_pcd": True,
    }
    xlsx = run_pipeline(cfg)
    assert os.path.exists(xlsx)
    with zipfile.ZipFile(xlsx) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    for col in ("length", "width", "volume", "inclination", "curvature",
                "file_id"):
        assert col in sheet
    outs = os.listdir(out_dir)
    assert any(f.endswith("_bboxes.json") for f in outs)
    assert any(f.endswith("_pcd.ply") for f in outs)
    bbox_file = [f for f in outs if f.endswith("_bboxes.json")][0]
    bboxes = json.load(open(out_dir / bbox_file))
    assert len(bboxes) == 6   # 3 heads x (obb + aabb)


def test_yaml_config_validation(tmp_path):
    from wheat3dgs_tpu.morphology import load_config

    (tmp_path / "data").mkdir()
    cfg_text = f"""
data_folder: "data/"
output_folder: "out/"
file_format: "ply"
subsampling_threshold: 5000
clusterer_definition:
  type: "hdbscan"
  min_samples: 15
  min_cluster_size: 250
  epsilon_hdbscan: 0.015
sor_parameters:
  k: 200
  std_ratio: 3
splines_smoothing_value: 1
distance_percentile: 99
get_bboxes: true
get_processed_pcd: true
"""
    p = tmp_path / "config.yaml"
    p.write_text(cfg_text)
    cfg = load_config(p)
    assert cfg.file_format == "ply"
    assert os.path.isdir(cfg.output_folder)

    bad = cfg_text.replace("distance_percentile: 99",
                           "distance_percentile: 150")
    p2 = tmp_path / "bad.yaml"
    p2.write_text(bad)
    with pytest.raises(Exception):
        load_config(p2)
