"""Numeric validation of ops/lpips.py against a from-scratch NumPy model.

The sandbox has zero egress so the pretrained VGG16/LPIPS weights can never
be downloaded; instead the MATH is validated: a real-topology VGG16 trunk +
LPIPS heads with small random weights, evaluated by an independent NumPy
implementation of the reference semantics
(/root/reference/lpipsPyTorch/modules/networks.py:36-99, lpips.py:31-37,
utils.py:6-8):
  z_score((x - mean)/std on [0,1] inputs, NO 2x-1 mapping) -> VGG16 convs
  -> unit-normalize at the five block-end ReLUs -> squared diff -> 1x1
  no-bias head -> spatial mean -> sum over layers.
"""

import numpy as np
import pytest

# torchvision VGG16 conv layer indices + (in, out) channels.
_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]
_BLOCK_ENDS = {2, 7, 14, 21, 28}       # last conv index of each block
_HEAD_CH = [64, 128, 256, 512, 512]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _make_weights(path, rng):
    arrs = {}
    for idx, cin, cout in _CONVS:
        arrs[f"features.{idx}.weight"] = rng.normal(
            0, 0.2 / np.sqrt(cin), (cout, cin, 3, 3)).astype(np.float32)
        arrs[f"features.{idx}.bias"] = rng.normal(
            0, 0.05, (cout,)).astype(np.float32)
    for k, nc in enumerate(_HEAD_CH):
        arrs[f"lin{k}.model.1.weight"] = np.abs(rng.normal(
            0, 0.1, (1, nc, 1, 1))).astype(np.float32)
    np.savez(path, **arrs)
    return arrs


def _np_conv3x3(x, w, b):
    """Direct padded 3x3 conv, NCHW/OIHW, stride 1 (independent of jax)."""
    n, cin, h, wd = x.shape
    cout = w.shape[0]
    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    out = np.zeros((n, cout, h, wd), np.float64)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, :, dy:dy + h, dx:dx + wd]      # (N, Cin, H, W)
            out += np.einsum("nchw,oc->nohw", patch, w[:, :, dy, dx],
                             optimize=True)
    return (out + b.reshape(1, -1, 1, 1)).astype(np.float64)


def _np_maxpool2(x):
    n, c, h, w = x.shape
    return x.reshape(n, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


def _np_lpips(arrs, x, y):
    def trunk(img):
        z = (img - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)
        feats = []
        for idx, _, _ in _CONVS:
            z = np.maximum(
                _np_conv3x3(z, arrs[f"features.{idx}.weight"],
                            arrs[f"features.{idx}.bias"]), 0.0)
            if idx in _BLOCK_ENDS:
                norm = np.sqrt((z ** 2).sum(axis=1, keepdims=True))
                feats.append(z / (norm + 1e-10))
                if idx != 28:
                    z = _np_maxpool2(z)
        return feats

    fx, fy = trunk(x.astype(np.float64)), trunk(y.astype(np.float64))
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        head = arrs[f"lin{k}.model.1.weight"].reshape(1, -1, 1, 1)
        total += (head * d).sum(axis=1).mean()
    return total


@pytest.fixture(scope="module")
def weights(tmp_path_factory):
    rng = np.random.default_rng(7)
    path = tmp_path_factory.mktemp("lpips") / "w.npz"
    arrs = _make_weights(str(path), rng)
    return str(path), arrs


def test_lpips_matches_numpy_reference(weights):
    from wheat3dgs_tpu.ops.lpips import load_lpips

    path, arrs = weights
    lpips = load_lpips(path)
    rng = np.random.default_rng(3)
    x = rng.random((3, 32, 32), np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape).astype(np.float32), 0, 1)
    got = float(lpips(x, y))
    want = _np_lpips(arrs, x[None], y[None])
    assert got == pytest.approx(want, rel=2e-4), (got, want)
    # identical images -> exactly zero distance
    assert float(lpips(x, x)) == pytest.approx(0.0, abs=1e-8)


def test_lpips_input_range_semantics(weights):
    """The reference feeds [0,1] images straight to z_score (no 2x-1);
    verify our z_score path by checking a uniform shift changes the score
    the way the un-remapped normalization predicts."""
    from wheat3dgs_tpu.ops.lpips import load_lpips

    path, arrs = weights
    lpips = load_lpips(path)
    x = np.full((3, 16, 16), 0.25, np.float32)
    y = np.full((3, 16, 16), 0.75, np.float32)
    got = float(lpips(x, y))
    want = _np_lpips(arrs, x[None], y[None])
    assert got == pytest.approx(want, rel=2e-4), (got, want)
    assert got > 0.0


def test_metrics_app_emits_lpips_with_weights(weights, tmp_path):
    """metrics_app reports LPIPS when a weights npz is supplied."""
    import json

    from PIL import Image

    from wheat3dgs_tpu.apps import metrics_app

    path, _ = weights
    rng = np.random.default_rng(0)
    rdir = tmp_path / "model" / "test" / "ours_100"
    (rdir / "renders").mkdir(parents=True)
    (rdir / "gt").mkdir(parents=True)

    def save(img, p):
        arr = (np.clip(img, 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)

    for i in range(2):
        img = rng.random((3, 24, 24), np.float32)
        noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1)
        save(img, str(rdir / "renders" / f"{i:05d}.png"))
        save(noisy, str(rdir / "gt" / f"{i:05d}.png"))
    results = metrics_app.evaluate([str(tmp_path / "model")],
                                   lpips_weights=path)
    assert results["ours_100"]["LPIPS"] is not None
    assert results["ours_100"]["LPIPS"] > 0.0
    with open(tmp_path / "model" / "results.json") as f:
        assert json.load(f)["ours_100"]["LPIPS"] > 0.0


def test_convert_lpips_weights_roundtrip(weights, tmp_path):
    """scripts/convert_lpips_weights.py: a torch-saved VGG16 state dict +
    lin-head checkpoint converts to an npz that load_lpips scores
    identically to the directly-written weights file."""
    import sys

    import torch

    sys.path.insert(0, "scripts")
    try:
        from convert_lpips_weights import convert
    finally:
        sys.path.pop(0)
    from wheat3dgs_tpu.ops.lpips import load_lpips

    path, arrs = weights
    vgg_sd = {k: torch.from_numpy(v) for k, v in arrs.items()
              if k.startswith("features.")}
    lin_sd = {k: torch.from_numpy(v) for k, v in arrs.items()
              if k.startswith("lin")}
    vgg_pth = tmp_path / "vgg16.pth"
    lin_pth = tmp_path / "lin.pth"
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)

    out_npz = tmp_path / "converted.npz"
    convert(str(vgg_pth), str(lin_pth), str(out_npz))

    rng = np.random.default_rng(5)
    x = rng.random((3, 24, 24), np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    ref = float(load_lpips(path)(x, y))
    got = float(load_lpips(str(out_npz))(x, y))
    assert got == pytest.approx(ref, rel=1e-6)

    # --lin none produces all-ones heads (valid schema, different score).
    out2 = tmp_path / "noline.npz"
    convert(str(vgg_pth), None, str(out2))
    val = float(load_lpips(str(out2))(x, y))
    assert np.isfinite(val) and val > 0.0


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_synthesized_backbones(net, tmp_path):
    """synthesize_lpips_weights: all three reference backbones
    (lpipsPyTorch/modules/networks.py:66-99) produce a deterministic,
    labeled artifact whose distance is 0 at x==x and positive otherwise."""
    from wheat3dgs_tpu.ops import lpips as L

    p1 = tmp_path / f"{net}_a.npz"
    p2 = tmp_path / f"{net}_b.npz"
    L.synthesize_lpips_weights(str(p1), net, seed=0)
    L.synthesize_lpips_weights(str(p2), net, seed=0)
    d1, d2 = dict(np.load(p1)), dict(np.load(p2))
    for k in d1:
        np.testing.assert_array_equal(d1[k], d2[k])   # deterministic
    assert L.is_untrained(str(p1))

    fn = L.load_lpips(str(p1))                        # net auto-detected
    rng = np.random.default_rng(0)
    # Large enough that squeeze's stride-2 conv + 3 ceil-mode pools and
    # alex's stride-4 conv keep nonzero spatial dims at the last tap.
    x = rng.random((3, 72, 72), np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape).astype(np.float32), 0, 1)
    assert float(fn(x, x)) == pytest.approx(0.0, abs=1e-6)
    v = float(fn(x, y))
    assert np.isfinite(v) and v > 0.0

    # Per-net tap-channel parity with the reference n_channels_list.
    assert tuple(L.LIN_CHANNELS[net]) == {
        "vgg": (64, 128, 256, 512, 512),
        "alex": (64, 192, 384, 256, 256),
        "squeeze": (64, 128, 256, 384, 384, 512, 512)}[net]
