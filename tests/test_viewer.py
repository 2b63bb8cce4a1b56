"""Web viewer smoke test: serve a tiny scene, fetch page/info/frames."""

import json
import urllib.request

import numpy as np

from wheat3dgs_tpu.render.pipeline import RasterConfig
from wheat3dgs_tpu.viewer import ViewerState, serve


def test_viewer_serves_frames():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    state = ge._tiny_state(200, 512, 1, seed=0)
    labels = np.zeros((3, 512), bool)
    labels[1, :50] = True
    labels[2, 50:100] = True
    vs = ViewerState(state, sh_degree=1, width=96, height=64,
                     obj_labels=labels,
                     camera_names=["train:cam01"],
                     camera_poses=[(np.array([3.0, 0, 1.0]),
                                    np.zeros(3))],
                     scale_filter=None,
                     config=RasterConfig(max_tiles_per_gauss=8,
                                         max_per_tile=64, tile_batch=8))
    httpd = serve(vs, host="127.0.0.1", port=0, blocking=False)
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        page = urllib.request.urlopen(base + "/").read()
        assert b"wheat3dgs_tpu viewer" in page

        info = json.loads(urllib.request.urlopen(base + "/info").read())
        assert info["cameras"] == ["train:cam01"]
        assert info["n_heads"] == 2

        tp = json.loads(urllib.request.urlopen(
            base + "/teleport?i=0").read())
        assert abs(tp["dist"] - np.sqrt(10.0)) < 1e-3

        jpeg = urllib.request.urlopen(
            base + "/render?az=0.8&el=0.7&dist=4&overlay=0").read()
        assert jpeg[:2] == b"\xff\xd8"        # JPEG magic
        jpeg2 = urllib.request.urlopen(
            base + "/render?az=0.8&el=0.7&dist=4&overlay=1&heads=1").read()
        assert jpeg2[:2] == b"\xff\xd8"
    finally:
        httpd.shutdown()
