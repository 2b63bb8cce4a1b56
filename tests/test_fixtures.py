"""Reference-artifact format round-trips against checked-in fixtures.

The real FIP data never reaches this sandbox, so these fixtures pin the
EXACT on-disk formats the reference tooling produces/consumes — cfg_args
(train_vanilla_3dgs.py:134-135), cameras.json (utils/camera_utils.py:64-84),
all_counts.pt (run_3d_seg.py saved torch tensor) — so loader drift vs the
reference can't creep in silently.
"""

import json
import os
from argparse import ArgumentParser

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_cfg_args_fixture_parses_and_merges():
    """get_combined_args reads a reference-written cfg_args and merges CLI
    flags over it (arguments/__init__.py:92-112 semantics: cmdline wins
    only for non-None values)."""
    from wheat3dgs_tpu.config import _parse_namespace_repr, get_combined_args

    text = open(os.path.join(FIX, "cfg_args")).read()
    d = _parse_namespace_repr(text)
    assert d["sh_degree"] == 3 and d["resolution"] == 1
    assert d["eval"] is True and d["white_background"] is False
    assert d["source_path"].endswith("plot_461")
    assert d["data_device"] == "cuda"    # reference-only field tolerated

    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", type=str)
    parser.add_argument("--iteration", type=int, default=None)
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    try:
        shutil.copy(os.path.join(FIX, "cfg_args"), tmp)
        args = get_combined_args(parser, ["-m", tmp, "--iteration", "7000"])
        assert args.sh_degree == 3          # from cfg_args
        assert args.iteration == 7000       # cmdline overlays
        assert args.model_path == tmp
    finally:
        shutil.rmtree(tmp)


def test_cameras_json_fixture_roundtrip():
    """A reference-schema cameras.json entry reconstructs to a CameraMeta
    whose camera_to_json re-serialization is bit-identical in schema and
    close in value (the reference stores c2w position/rotation; COLMAP
    convention R = c2w rotation, T = w2c translation)."""
    from wheat3dgs_tpu.io.cameras import CameraMeta, camera_to_json
    from wheat3dgs_tpu.utils import graphics

    cams = json.load(open(os.path.join(FIX, "cameras.json")))
    assert [sorted(c.keys()) for c in cams] == [
        sorted(["id", "img_name", "width", "height", "position",
                "rotation", "fy", "fx"])] * len(cams)
    for c in cams:
        # Invert the reference serialization: c2w -> (R, T) as the COLMAP
        # loaders produce them (R = c2w rot, T = w2c translation).
        c2w = np.eye(4)
        c2w[:3, :3] = np.array(c["rotation"])
        c2w[:3, 3] = np.array(c["position"])
        w2c = np.linalg.inv(c2w)
        meta = CameraMeta(
            uid=c["id"], colmap_id=c["id"] + 1, image_name=c["img_name"],
            R=w2c[:3, :3].T, T=w2c[:3, 3],
            fovx=graphics.focal2fov(c["fx"], c["width"]),
            fovy=graphics.focal2fov(c["fy"], c["height"]))
        out = camera_to_json(c["id"], meta, c["width"], c["height"])
        assert out["img_name"] == c["img_name"]
        np.testing.assert_allclose(out["position"], c["position"],
                                   atol=1e-10)
        np.testing.assert_allclose(out["rotation"], c["rotation"],
                                   atol=1e-10)
        np.testing.assert_allclose(out["fx"], c["fx"], rtol=1e-9)
        np.testing.assert_allclose(out["fy"], c["fy"], rtol=1e-9)
        # wheat split rule applies to these names (dataset_readers.py:186-191)
        cam_id = int(c["img_name"].split("_")[2])
        assert (cam_id > 10) == (c["img_name"] == "plot_461_11_000")


def test_all_counts_pt_fixture():
    """load_pt reads a reference-saved all_counts tensor and
    multi_instance_opt assigns each Gaussian to its dominant head."""
    import jax.numpy as jnp

    from wheat3dgs_tpu.ops.mask_lift import multi_instance_opt
    from wheat3dgs_tpu.seg.pipeline import load_pt, save_pt

    counts = load_pt(os.path.join(FIX, "all_counts.pt"))
    assert counts.shape == (3, 8) and counts.dtype == np.float32
    labels = np.asarray(multi_instance_opt(jnp.asarray(counts)))
    assert labels.shape == (3, 8) and labels.dtype == bool
    # Gaussian 1 is dominated by head 1, Gaussian 2 by head 2.
    assert labels[1, 1] and labels[2, 2]
    assert not labels[1, 0] and not labels[2, 0]

    # save_pt writes torch-loadable artifacts (reference tooling compat).
    import tempfile

    import torch

    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "rt.pt")
        save_pt(counts, p)
        back = torch.load(p, weights_only=True).numpy()
        np.testing.assert_array_equal(back, counts)


def test_reference_layout_ply_fixtures():
    """load_ply reads PLYs in the reference's exact plyfile layout
    (scene/gaussian_model.py:212-293: x,y,z,nx,ny,nz,f_dc_0..2,
    f_rest_0..44 CHANNEL-major, opacity, scale_*, rot_* [, which_object]),
    and save_ply round-trips to the identical attribute set. The fixtures
    were written by tests/fixtures/make_ref_ply.py's independent writer."""
    import tempfile

    from wheat3dgs_tpu.io.ply import read_ply
    from wheat3dgs_tpu.models.serialization import load_ply, save_ply

    path = os.path.join(FIX, "point_cloud_ref.ply")
    raw = read_ply(path)
    state, sh_degree = load_ply(path)
    assert sh_degree == 3
    n = len(raw["x"])
    assert int(state.num_alive) == n == 16
    np.testing.assert_array_equal(
        np.asarray(state.params.means)[:n, 0], raw["x"])
    np.testing.assert_array_equal(
        np.asarray(state.params.opacity_logit)[:n], raw["opacity"])
    # f_rest is CHANNEL-major on disk (3 blocks of K-1 coeffs); our state is
    # coeff-major. Band (coeff j, channel c) on disk = f_rest_{c*(K-1)+j}.
    k1 = 15
    sr = np.asarray(state.params.sh_rest)[:n].reshape(n, k1, 3)
    np.testing.assert_array_equal(sr[:, 4, 1], raw[f"f_rest_{k1 + 4}"])

    # Round-trip: save_ply re-emits the identical reference attribute set.
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "rt.ply")
        save_ply(state, out)
        back = read_ply(out)
        for k in raw:
            np.testing.assert_allclose(back[k][:n], raw[k], atol=0,
                                       err_msg=k)

    # Seg artifact variant: which_object column -> instance ids.
    whead = os.path.join(FIX, "wheat_head_ref.ply")
    raww = read_ply(whead)
    statew, _ = load_ply(whead)
    np.testing.assert_array_equal(
        np.asarray(statew.instance_id)[:12],
        raww["which_object"].astype(np.int32))
