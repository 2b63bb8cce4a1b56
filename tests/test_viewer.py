"""Web viewer tests: endpoints, teleport math, overlay whitelist,
scale filter, orbit-camera geometry (target: viewer/server.py)."""

import json
import sys
import urllib.error
import urllib.request

import numpy as np
import pytest

from wheat3dgs_tpu.render.pipeline import RasterConfig
from wheat3dgs_tpu.viewer import ViewerState, serve

sys.path.insert(0, "/root/repo")
import __graft_entry__ as ge  # noqa: E402

_CFG = RasterConfig(max_tiles_per_gauss=8, max_per_tile=64, tile_batch=8)


def _fetch(base, path):
    return urllib.request.urlopen(base + path).read()


@pytest.fixture(scope="module")
def viewer():
    state = ge._tiny_state(200, 512, 1, seed=0)
    labels = np.zeros((3, 512), bool)
    labels[1, :50] = True
    labels[2, 50:100] = True
    vs = ViewerState(state, sh_degree=1, width=96, height=64,
                     obj_labels=labels,
                     camera_names=["train:cam01", "test:cam11"],
                     camera_poses=[(np.array([3.0, 0, 1.0]), np.zeros(3)),
                                   (np.array([1.0, 2.0, 2.0]),
                                    np.array([0.5, -0.5, 1.0]))],
                     scale_filter=None, config=_CFG)
    httpd = serve(vs, host="127.0.0.1", port=0, blocking=False)
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield vs, base
    httpd.shutdown()


def test_viewer_page_and_info(viewer):
    vs, base = viewer
    assert b"wheat3dgs_tpu viewer" in _fetch(base, "/")
    info = json.loads(_fetch(base, "/info"))
    assert info["cameras"] == ["train:cam01", "test:cam11"]
    assert info["n_heads"] == 2
    assert info["radius"] > 0
    np.testing.assert_allclose(info["center"], vs.center, atol=1e-6)


def test_viewer_teleport_math(viewer):
    _, base = viewer
    tp = json.loads(_fetch(base, "/teleport?i=0"))
    assert tp["dist"] == pytest.approx(np.sqrt(10.0), abs=1e-3)
    assert tp["az"] == pytest.approx(0.0, abs=1e-6)          # +x direction
    assert tp["el"] == pytest.approx(np.arcsin(1 / np.sqrt(10)), abs=1e-6)
    assert tp["center"] == [0.0, 0.0, 0.0]
    # non-origin target: d = eye - target = (0.5, 2.5, 1.0)
    tp = json.loads(_fetch(base, "/teleport?i=1"))
    d = np.array([0.5, 2.5, 1.0])
    assert tp["dist"] == pytest.approx(np.linalg.norm(d), abs=1e-4)
    assert tp["az"] == pytest.approx(np.arctan2(2.5, 0.5), abs=1e-6)
    assert tp["el"] == pytest.approx(
        np.arcsin(1.0 / np.linalg.norm(d)), abs=1e-6)
    assert tp["center"] == [0.5, -0.5, 1.0]
    # teleported orbit params reproduce the stored eye position
    vs, _ = viewer
    w2c, _, eye = vs.camera_from_orbit(tp["az"], tp["el"], tp["dist"],
                                       np.asarray(tp["center"]))
    np.testing.assert_allclose(eye, [1.0, 2.0, 2.0], atol=1e-5)
    # w2c maps the eye to the origin and is a rigid transform
    h = w2c @ np.array([*eye, 1.0])
    np.testing.assert_allclose(h[:3], 0.0, atol=1e-5)
    np.testing.assert_allclose(w2c[:3, :3] @ w2c[:3, :3].T, np.eye(3),
                               atol=1e-5)


def test_viewer_render_and_overlay_whitelist(viewer):
    _, base = viewer
    plain = _fetch(base, "/render?az=0.8&el=0.7&dist=4&overlay=0")
    assert plain[:2] == b"\xff\xd8"                     # JPEG magic
    both = _fetch(base, "/render?az=0.8&el=0.7&dist=4&overlay=1")
    only1 = _fetch(base, "/render?az=0.8&el=0.7&dist=4&overlay=1&heads=1")
    only2 = _fetch(base, "/render?az=0.8&el=0.7&dist=4&overlay=1&heads=2")
    assert both[:2] == only1[:2] == only2[:2] == b"\xff\xd8"
    # the whitelist actually changes the overlay
    assert only1 != only2
    assert both != plain
    # junk head ids are ignored, not crashed on
    junk = _fetch(base, "/render?az=0.8&el=0.7&dist=4&overlay=1&heads=zz,,9")
    assert junk[:2] == b"\xff\xd8"


def test_viewer_unknown_path_404(viewer):
    _, base = viewer
    with pytest.raises(urllib.error.HTTPError) as e:
        _fetch(base, "/nope")
    assert e.value.code == 404


def test_viewer_scale_filter_drops_big_splats():
    import dataclasses

    import jax.numpy as jnp

    state = ge._tiny_state(100, 128, 1, seed=1)
    scales = jnp.full_like(state.params.log_scales, jnp.log(0.02))
    big = scales.at[:10].set(jnp.log(0.5))           # 10 splats > 0.1 filter
    state = dataclasses.replace(
        state, params=dataclasses.replace(state.params, log_scales=big))
    n_alive_before = int(state.num_alive)
    vs = ViewerState(state, sh_degree=1, width=32, height=32,
                     scale_filter=0.1, config=_CFG)
    assert int(vs.state.num_alive) == n_alive_before - 10
    vs_off = ViewerState(state, sh_degree=1, width=32, height=32,
                         scale_filter=None, config=_CFG)
    assert int(vs_off.state.num_alive) == n_alive_before
