"""M0 IO tests: PLY round-trip, COLMAP binary/text parsers, config system,
camera batch construction."""

import os

import numpy as np
import pytest

from wheat3dgs_tpu.io import colmap, ply
from wheat3dgs_tpu.io.cameras import make_camera, make_camera_from_c2w, resolve_resolution
from wheat3dgs_tpu.utils import graphics
from wheat3dgs_tpu import config


class TestPly:
    def test_roundtrip_float(self, tmp_path):
        path = str(tmp_path / "test.ply")
        rng = np.random.default_rng(0)
        props = {
            "x": rng.normal(size=10).astype("<f4"),
            "y": rng.normal(size=10).astype("<f4"),
            "opacity": rng.normal(size=10).astype("<f4"),
            "which_object": np.arange(10).astype("<f4"),
        }
        ply.write_ply(path, props)
        out = ply.read_ply(path)
        for k in props:
            assert np.array_equal(out[k], props[k])

    def test_points_roundtrip(self, tmp_path):
        path = str(tmp_path / "pts.ply")
        xyz = np.random.default_rng(1).normal(size=(20, 3))
        rgb = (np.random.default_rng(2).uniform(size=(20, 3)) * 255).astype(np.uint8)
        ply.write_points_ply(path, xyz, rgb)
        pcd = ply.read_points_ply(path)
        assert np.allclose(pcd.points, xyz, atol=1e-6)
        assert np.allclose(pcd.colors, rgb / 255.0, atol=1e-6)
        assert np.allclose(pcd.normals, 0)


class TestColmap:
    def _make_model(self, tmp_path):
        rng = np.random.default_rng(3)
        cams = {1: colmap.ColmapCamera(1, "PINHOLE", 640, 480,
                                       np.array([500.0, 480.0, 320.0, 240.0]))}
        images = {}
        for i in range(1, 4):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            images[i] = colmap.ColmapImage(
                i, q, rng.normal(size=3), 1, f"plot_461_{i:02d}.png",
                np.array([[1.0, 2.0], [3.0, 4.0]]), np.array([7, -1], np.int64))
        xyz = rng.normal(size=(5, 3))
        rgb = (rng.uniform(size=(5, 3)) * 255).astype(np.uint8)
        sparse = tmp_path / "sparse" / "0"
        sparse.mkdir(parents=True)
        colmap.write_intrinsics_binary(str(sparse / "cameras.bin"), cams)
        colmap.write_extrinsics_binary(str(sparse / "images.bin"), images)
        colmap.write_points3D_binary(str(sparse / "points3D.bin"), xyz, rgb)
        return cams, images, xyz, rgb, sparse

    def test_binary_roundtrip(self, tmp_path):
        cams, images, xyz, rgb, sparse = self._make_model(tmp_path)
        intr = colmap.read_intrinsics_binary(str(sparse / "cameras.bin"))
        extr = colmap.read_extrinsics_binary(str(sparse / "images.bin"))
        pxyz, prgb, perr = colmap.read_points3D_binary(str(sparse / "points3D.bin"))
        assert intr[1].model == "PINHOLE"
        assert intr[1].width == 640
        assert np.allclose(intr[1].params, cams[1].params)
        for i in images:
            assert np.allclose(extr[i].qvec, images[i].qvec)
            assert np.allclose(extr[i].tvec, images[i].tvec)
            assert extr[i].name == images[i].name
            assert np.array_equal(extr[i].point3D_ids, images[i].point3D_ids)
        assert np.allclose(pxyz, xyz)
        assert np.array_equal(prgb, rgb)

    def test_text_parsers(self, tmp_path):
        (tmp_path / "cameras.txt").write_text(
            "# comment\n1 SIMPLE_PINHOLE 100 80 90.0 50.0 40.0\n")
        (tmp_path / "images.txt").write_text(
            "1 0.7071 0.7071 0 0 1.0 2.0 3.0 1 img_01.png\n"
            "10.0 20.0 5 30.0 40.0 -1\n")
        intr = colmap.read_intrinsics_text(str(tmp_path / "cameras.txt"))
        extr = colmap.read_extrinsics_text(str(tmp_path / "images.txt"))
        assert intr[1].model == "SIMPLE_PINHOLE"
        assert intr[1].params[0] == 90.0
        assert extr[1].name == "img_01.png"
        assert np.allclose(extr[1].xys, [[10, 20], [30, 40]])


class TestConfig:
    def test_defaults_match_reference(self):
        opt = config.OptimizationParams()
        assert opt.iterations == 15_000
        assert opt.densify_until_iter == 11_000
        assert opt.densify_grad_threshold == 2e-4
        assert config.ModelParams().sh_degree == 3
        assert config.ModelParams().resolution == 1

    def test_cli_and_cfg_args_roundtrip(self, tmp_path):
        from argparse import ArgumentParser

        parser = ArgumentParser()
        config.add_params(parser, config.ModelParams)
        config.add_params(parser, config.OptimizationParams)
        args = parser.parse_args(["-s", "/data/plot", "-m", str(tmp_path),
                                  "--iterations", "7000"])
        model = config.extract(config.ModelParams, args)
        opt = config.extract(config.OptimizationParams, args)
        assert model.source_path == "/data/plot"
        assert opt.iterations == 7000
        config.save_cfg_args(str(tmp_path), model)
        assert os.path.exists(tmp_path / "cfg_args")

        parser2 = ArgumentParser()
        config.add_params(parser2, config.ModelParams, fill_none=True)
        merged = config.get_combined_args(parser2, ["-m", str(tmp_path)])
        assert merged.source_path == "/data/plot"
        assert merged.sh_degree == 3

    def test_cfg_args_reference_format(self, tmp_path):
        # a cfg_args file written by the reference torch pipeline parses fine
        (tmp_path / "cfg_args").write_text(
            "Namespace(data_device='cuda', eval=True, images='images', "
            "model_path='/out/plot_461', resolution=1, sh_degree=3, "
            "source_path='/data/plot_461', white_background=False)")
        from argparse import ArgumentParser

        parser = ArgumentParser()
        config.add_params(parser, config.ModelParams, fill_none=True)
        merged = config.get_combined_args(parser, ["-m", str(tmp_path)])
        assert merged.source_path == "/data/plot_461"
        assert merged.sh_degree == 3


class TestCameras:
    def test_center_and_projection(self):
        rng = np.random.default_rng(4)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_w2c = graphics.qvec_to_rotmat(q)
        t = rng.normal(size=3)
        cam = make_camera(R_w2c.T, t, 1.0, 0.8, 640, 480)
        # camera center: W2C @ center = 0
        c = np.asarray(cam.cam_center[0])
        assert np.allclose(R_w2c @ c + t, 0, atol=1e-5)
        # a world point straight ahead projects to ndc (0, 0)
        p_cam = np.array([0.0, 0.0, 2.0])
        p_world = R_w2c.T @ (p_cam - t)
        v = np.asarray(cam.full_proj[0]) @ np.append(p_world, 1.0)
        assert np.allclose(v[:2] / v[3], 0, atol=1e-5)
        assert v[3] > 0  # w = view depth sign

    def test_c2w_roundtrip(self):
        rng = np.random.default_rng(5)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R_w2c = graphics.qvec_to_rotmat(q)
        t = rng.normal(size=3)
        cam1 = make_camera(R_w2c.T, t, 1.0, 0.8, 64, 48)
        w2c = np.eye(4)
        w2c[:3, :3] = R_w2c
        w2c[:3, 3] = t
        cam2 = make_camera_from_c2w(np.linalg.inv(w2c), 1.0, 0.8, 64, 48)
        assert np.allclose(cam1.w2c, cam2.w2c, atol=1e-5)
        assert np.allclose(cam1.full_proj, cam2.full_proj, atol=1e-4)

    def test_resolution_policy(self):
        assert resolve_resolution(1600, 1200, 1) == ((1600, 1200), 1.0)
        assert resolve_resolution(1600, 1200, 8) == ((200, 150), 8.0)
        (w, h), s = resolve_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200 and s == 2.0
        (w, h), s = resolve_resolution(1600, 1200, 800)
        assert w == 800 and h == 600


def test_colmap_text_roundtrip(tmp_path):
    import numpy as np

    from wheat3dgs_tpu.io import colmap

    intr = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([50.0, 50.0, 32.0, 24.0]))}
    extr = {1: colmap.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), np.array([0.1, 0.2, 0.3]), 1,
        "img_01.png", np.array([[1.5, 2.5], [3.0, 4.0]]),
        np.array([1, -1], np.int64))}
    xyz = np.array([[0.0, 1.0, 2.0]])
    rgb = np.array([[255, 128, 0]], np.uint8)
    colmap.write_model(str(tmp_path), intr, extr, (xyz, rgb), ext=".txt")
    intr2 = colmap.read_intrinsics_text(str(tmp_path / "cameras.txt"))
    extr2 = colmap.read_extrinsics_text(str(tmp_path / "images.txt"))
    xyz2, rgb2, _ = colmap.read_points3D_text(str(tmp_path / "points3D.txt"))
    assert intr2[1].model == "PINHOLE" and intr2[1].width == 64
    np.testing.assert_allclose(extr2[1].tvec, extr[1].tvec)
    np.testing.assert_allclose(extr2[1].xys, extr[1].xys)
    np.testing.assert_allclose(xyz2, xyz)
    np.testing.assert_array_equal(rgb2, rgb)


def test_depth_scale_alignment(tmp_path):
    """make_depth_scales recovers a known affine inverse-depth alignment."""
    import json

    from PIL import Image

    from wheat3dgs_tpu.io import colmap
    from wheat3dgs_tpu.io.depth_scale import make_depth_scales
    from wheat3dgs_tpu.utils import graphics

    rng = np.random.default_rng(0)
    # one camera at origin looking +z, 3D points in front
    n = 200
    xyz = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    rng.uniform(2.0, 6.0, n)], 1)
    fx = fy = 100.0
    w, h = 128, 96
    uv = np.stack([fx * xyz[:, 0] / xyz[:, 2] + w / 2,
                   fy * xyz[:, 1] / xyz[:, 2] + h / 2], 1)
    keep = ((uv[:, 0] > 1) & (uv[:, 0] < w - 2)
            & (uv[:, 1] > 1) & (uv[:, 1] < h - 2))
    xyz, uv = xyz[keep], uv[keep]

    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    intr = {1: colmap.ColmapCamera(1, "PINHOLE", w, h,
                                   np.array([fx, fy, w / 2, h / 2]))}
    extr = {1: colmap.ColmapImage(
        1, np.array([1.0, 0, 0, 0]), np.zeros(3), 1, "img.png",
        uv, np.arange(1, len(xyz) + 1))}
    colmap.write_model(str(sparse), intr, extr,
                       (xyz, np.zeros((len(xyz), 3), np.uint8)))

    # mono inverse depth = 0.5 * true inverse depth + 0.002, as 16-bit png
    depths = tmp_path / "depths"
    depths.mkdir()
    inv_map = np.zeros((h, w), np.float32)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # dense synthetic inverse-depth field from a smooth function
    z_field = 2.0 + 4.0 * (xx / w)
    inv_map = 0.5 * (1.0 / z_field) + 0.002
    Image.fromarray((inv_map * 2 ** 16).astype(np.uint16)).save(
        depths / "img.png")
    # points must match the field: z = z_field at uv
    xyz[:, 2] = 2.0 + 4.0 * (uv[:, 0] / w)
    colmap.write_points3D_binary(str(sparse / "points3D.bin"), xyz,
                                 np.zeros((len(xyz), 3), np.uint8))

    params = make_depth_scales(str(tmp_path), str(depths))
    assert "img" in params
    # invcolmap = 2 * invmono - 0.004  =>  scale ~ 2, offset ~ -0.004
    assert params["img"]["scale"] == pytest.approx(2.0, rel=0.05)
    assert params["img"]["offset"] == pytest.approx(-0.004, abs=5e-4)
    assert json.load(open(sparse / "depth_params.json"))
