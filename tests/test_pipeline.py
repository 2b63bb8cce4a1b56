"""End-to-end pipeline tests: synthetic scene -> train CLI -> render CLI ->
metrics CLI, plus PLY/checkpoint round-trips."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from wheat3dgs_tpu.io.synthetic import load_bboxes, make_synthetic_colmap_scene
from wheat3dgs_tpu.models import gaussians as G
from wheat3dgs_tpu.models.serialization import (load_checkpoint, load_ply,
                                                save_checkpoint, save_ply)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("scene"))
    make_synthetic_colmap_scene(d, width=80, height=64, n_heads=2,
                                pts_per_head=60, ground_pts=300, seed=1)
    return d


def test_synthetic_scene_layout(scene_dir):
    imgs = sorted(os.listdir(os.path.join(scene_dir, "images")))
    assert len(imgs) == 12
    assert imgs[0] == "plot_000_01.png"
    for f in ("cameras.bin", "images.bin", "points3D.bin"):
        assert os.path.exists(os.path.join(scene_dir, "sparse", "0", f))
    boxes = load_bboxes(os.path.join(scene_dir, "bboxes", "plot_000_01.pt"))
    assert boxes.ndim == 2 and boxes.shape[1] == 4


def test_masks_are_visible_surface(scene_dir):
    """SAM stand-in masks must be occlusion-resolved: per view, head masks
    are near-disjoint (each pixel belongs to the nearest head only, modulo
    the few boundary pixels the SAM-like solidify pass closes over) —
    amodal isolated-render masks would overlap wherever heads occlude."""
    import collections

    import numpy as np
    from PIL import Image

    views = collections.defaultdict(list)
    for f in sorted(os.listdir(os.path.join(scene_dir, "masks"))):
        views[f.rsplit("_", 1)[0]].append(np.asarray(
            Image.open(os.path.join(scene_dir, "masks", f))) > 0)
    assert views
    for key, masks in views.items():
        total = sum(m.astype(int) for m in masks)
        overlap = (total > 1).sum()
        area = (total > 0).sum()
        assert overlap <= max(8, 0.05 * area), \
            f"head masks in {key} overlap on {overlap}/{area} px"


def test_regen_masks_deterministic(scene_dir):
    """regen_masks with the same params+seed reproduces masks byte-for-byte
    (lets experiments rewrite masks without invalidating trained models)."""
    import hashlib

    from wheat3dgs_tpu.io.synthetic import regen_masks

    mask_dir = os.path.join(scene_dir, "masks")

    def digest():
        return {f: hashlib.md5(open(os.path.join(mask_dir, f), "rb").read())
                .hexdigest() for f in os.listdir(mask_dir)}

    before = digest()
    regen_masks(scene_dir, width=80, height=64, n_heads=2,
                pts_per_head=60, ground_pts=300, seed=1)
    assert digest() == before


def test_scene_reader_split(scene_dir):
    from wheat3dgs_tpu.config import ModelParams
    from wheat3dgs_tpu.scene import Scene

    model = ModelParams(source_path=scene_dir, model_path="", eval=True)
    sc = Scene(model, sh_degree=2)
    assert len(sc.data.train.metas) == 10   # cams 01-10
    assert len(sc.data.test.metas) == 2     # cams 11-12
    assert sc.data.train.images.shape[1:] == (3, 64, 80)
    assert sc.cameras_extent > 0
    # masks + bboxes attached
    assert sc.data.train.metas[0].mask_paths
    assert sc.data.train.metas[0].bbox_path.endswith(".pt")


def test_ply_roundtrip(tmp_path):
    from wheat3dgs_tpu.testing import random_gaussians

    g = random_gaussians(n=17, seed=5, sh_degree=2)
    params = G.GaussianParams(
        means=jnp.asarray(g["means3d"]), quats=jnp.asarray(g["quats"]),
        log_scales=jnp.asarray(np.log(g["scales"])),
        sh_dc=jnp.asarray(g["sh"][:, 0]),
        sh_rest=jnp.asarray(g["sh"][:, 1:].reshape(len(g["sh"]), -1)),
        opacity_logit=jnp.asarray(np.linspace(-1, 1, 17, dtype=np.float32)))
    state = G.init_state(params, instance_id=np.arange(17, dtype=np.int32))
    path = str(tmp_path / "pc.ply")
    save_ply(state, path)
    loaded, sh_degree = load_ply(path)
    assert sh_degree == 2
    alive = np.asarray(loaded.alive)
    assert alive.sum() == 17
    for name in ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                 "opacity_logit"):
        a = np.asarray(getattr(state.params, name))[:17]
        b = np.asarray(getattr(loaded.params, name))[:17]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
    np.testing.assert_array_equal(np.asarray(loaded.instance_id)[:17],
                                  np.arange(17))


def test_checkpoint_roundtrip(tmp_path):
    state = G.create_from_pcd(
        np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32),
        np.full((20, 3), 0.4, np.float32), sh_degree=1, capacity=32)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(state, 123, path)
    restored, it = load_checkpoint(path, state)
    assert it == 123
    np.testing.assert_array_equal(np.asarray(restored.params.means),
                                  np.asarray(state.params.means))
    np.testing.assert_array_equal(np.asarray(restored.alive),
                                  np.asarray(state.alive))


@pytest.mark.slow
def test_train_render_metrics_cli(scene_dir, tmp_path):
    from wheat3dgs_tpu.apps.metrics_app import main as metrics_main
    from wheat3dgs_tpu.apps.render_sets import main as render_main
    from wheat3dgs_tpu.apps.train_vanilla import main as train_main

    model_dir = str(tmp_path / "model")
    train_main(["-s", scene_dir, "-m", model_dir, "--iterations", "120",
                "--densify_from_iter", "40", "--densify_until_iter", "100",
                "--densification_interval", "50",
                "--opacity_reset_interval", "10000",
                "--test_iterations", "120", "--save_iterations", "120",
                "--max_per_tile", "128", "--max_tiles_per_gauss", "16",
                "--sh_degree", "1", "--quiet"])
    ply = os.path.join(model_dir, "point_cloud", "iteration_120",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_dir, "cfg_args"))
    assert os.path.exists(os.path.join(model_dir, "cameras.json"))

    render_main(["-m", model_dir])
    test_renders = os.path.join(model_dir, "test", "ours_120", "renders")
    assert len(os.listdir(test_renders)) == 2

    metrics_main(["-m", model_dir])
    results = json.load(open(os.path.join(model_dir, "results.json")))
    assert results["ours_120"]["PSNR"] > 20.0
    assert results["ours_120"]["SSIM"] > 0.6


def test_blender_scene_reader(tmp_path):
    """NeRF-synthetic transforms.json scenes load and train."""
    import json

    from PIL import Image

    from wheat3dgs_tpu.config import ModelParams
    from wheat3dgs_tpu.scene import Scene

    src = tmp_path / "blender"
    src.mkdir()
    (src / "train").mkdir()
    (src / "test").mkdir()
    rng = np.random.default_rng(0)

    def frames(split, n):
        out = []
        for i in range(n):
            ang = 2 * np.pi * i / n
            c2w = np.eye(4)
            # camera on a ring looking inward (OpenGL convention: -z forward)
            eye = np.array([2 * np.cos(ang), 2 * np.sin(ang), 1.0])
            fwd = -eye / np.linalg.norm(eye)
            up = np.array([0, 0, 1.0])
            right = np.cross(fwd, up)
            right /= np.linalg.norm(right)
            up2 = np.cross(right, fwd)
            c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = \
                right, up2, -fwd, eye
            img = (rng.random((24, 32, 4)) * 255).astype(np.uint8)
            Image.fromarray(img, "RGBA").save(src / split / f"r_{i}.png")
            out.append({"file_path": f"./{split}/r_{i}",
                        "transform_matrix": c2w.tolist()})
        return out

    for split, n in (("train", 4), ("test", 2)):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames(split, n)}, f)

    from wheat3dgs_tpu.io import dataset as ds

    data = ds.read_blender_scene(str(src), num_random_points=1000)
    assert len(data.train.metas) == 4
    assert len(data.test.metas) == 2
    assert data.train.images.shape == (4, 3, 24, 32)
    assert data.point_cloud is not None                # random init cloud
    assert len(data.point_cloud.points) == 1000
    assert data.cameras_extent > 0
    # Scene auto-detection picks the Blender reader for transforms dirs.
    assert os.path.exists(src / "points3d.ply")
    # Gaussians initialize from the random cloud.
    state = G.create_from_pcd(data.point_cloud.points.astype(np.float32),
                              data.point_cloud.colors.astype(np.float32),
                              sh_degree=1, capacity=2048)
    assert int(state.num_alive) == 1000


def test_checkpoint_resume_cli(scene_dir, tmp_path):
    """--start_checkpoint resumes training incl. Adam state
    (reference train_vanilla_3dgs.py --start_checkpoint -> restore())."""
    from wheat3dgs_tpu.apps.train_vanilla import main as train_main

    model_dir = str(tmp_path / "model")
    common = ["-s", scene_dir, "-m", model_dir,
              "--densify_from_iter", "1000", "--test_iterations", "-1",
              "--max_per_tile", "128", "--sh_degree", "1", "--quiet"]
    train_main(common + ["--iterations", "40", "--save_iterations", "-1",
                         "--checkpoint_iterations", "40"])
    ck = os.path.join(model_dir, "chkpnt40.npz")
    assert os.path.exists(ck)
    train_main(common + ["--iterations", "60", "--save_iterations", "60",
                         "--start_checkpoint", ck])
    assert os.path.exists(os.path.join(
        model_dir, "point_cloud", "iteration_60", "point_cloud.ply"))
    recs = [json.loads(l) for l in
            open(os.path.join(model_dir, "metrics.jsonl"))]
    assert recs[-1]["iter"] == 60
