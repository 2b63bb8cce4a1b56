"""LPIPS perceptual metric (reference: lpipsPyTorch/, three backbones).

The reference ships VGG16 / AlexNet / SqueezeNet feature trunks
(lpipsPyTorch/modules/networks.py:12-96) whose pretrained weights it
downloads at runtime (lpipsPyTorch/modules/utils.py:12-30); this sandbox has
zero egress, so the metric loads weights from a single npz instead. The
implementation is complete for all three net types: pure-JAX conv trunks
with the LPIPS unit-normalize + linear-head distance, numerically matching
the torch reference given the same weights.

Weights file format (npz), following torchvision ``features.<i>.*`` naming:
  vgg      conv kernels ``features.<i>.weight`` (OIHW) / ``.bias`` at the 13
           torchvision VGG16 conv indices; taps after relu1_2..relu5_3.
  alex     5 conv layers at torchvision AlexNet indices 0,3,6,8,10; taps
           after every relu.
  squeeze  first conv at ``features.0.*`` plus Fire modules at indices
           3,4,6,7,9,10,11,12 with ``.squeeze/.expand1x1/.expand3x3``
           sub-keys; 7 taps (networks.py SqueezeNet slices).
plus LPIPS heads ``lin<k>.model.1.weight`` and an optional ``__net__``
marker array (utf-8 bytes of the net type) and ``__untrained__`` flag.

Producing weights: ``scripts/convert_lpips_weights.py`` converts real torch
checkpoints outside the sandbox. Inside the sandbox
``synthesize_lpips_weights`` writes a DETERMINISTIC He-initialized backbone
(fixed seed) — a valid perceptual-architecture distance that exercises the
full pipeline and is reproducible across machines, but NOT comparable to
published LPIPS numbers (results produced with it are labeled, see
``is_untrained``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision VGG16 conv layer indices per block (through relu x_2/x_3).
_VGG16_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_VGG16_CH = (64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512)

# torchvision AlexNet conv layers: (features idx, out_ch, kernel, stride,
# pad); LPIPS taps after every relu (networks.py:62-96 slice1..slice5).
_ALEX_CONVS = ((0, 64, 11, 4, 2), (3, 192, 5, 1, 2), (6, 384, 3, 1, 1),
               (8, 256, 3, 1, 1), (10, 256, 3, 1, 1))
# MaxPool(3, stride 2) sits after relu1 and relu2 (features idx 2 and 5).
_ALEX_POOL_AFTER = (0, 1)

# torchvision SqueezeNet1_1 features: conv0 + Fire modules; (idx, squeeze_ch,
# expand_ch) — each Fire outputs 2*expand_ch. MaxPool(3,2,ceil) after
# features idx 1, 4, 7. LPIPS taps per networks.py SqueezeNet slices:
# relu1, fire4, fire7(=idx 7 output? no — slice boundaries [2,5,8,10,11,12,13])
# => taps after features idx 1, 4, 7, 9, 10, 11, 12 (7 taps).
_SQUEEZE_FIRES = ((3, 16, 64), (4, 16, 64), (6, 32, 128), (7, 32, 128),
                  (9, 48, 192), (10, 48, 192), (11, 64, 256), (12, 64, 256))
_SQUEEZE_POOL_AFTER = (1, 4, 7)       # maxpool follows these features idx
_SQUEEZE_TAPS = (1, 4, 7, 9, 10, 11, 12)

LIN_CHANNELS = {
    "vgg": (64, 128, 256, 512, 512),
    "alex": (64, 192, 384, 256, 256),
    "squeeze": (64, 128, 256, 384, 384, 512, 512),
}


def _conv(x, w, b, stride=1, pad=1):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b.reshape(1, -1, 1, 1)


def _maxpool(x, k=2, s=2, ceil=False):
    h, w = x.shape[2], x.shape[3]
    pad_h = pad_w = (0, 0)
    if ceil:
        # torch ceil_mode: pad the right/bottom so the last window fits.
        rem_h, rem_w = (h - k) % s, (w - k) % s
        pad_h = (0, (s - rem_h) % s if rem_h else 0)
        pad_w = (0, (s - rem_w) % s if rem_w else 0)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s),
        [(0, 0), (0, 0), pad_h, pad_w])


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt((feat ** 2).sum(axis=1, keepdims=True))
    return feat / (norm + eps)


def _detect_net(data: dict) -> str:
    if "__net__" in data:
        return bytes(np.asarray(data["__net__"]).tolist()).decode()
    if "features.3.squeeze.weight" in data:
        return "squeeze"
    if "features.28.weight" in data:
        return "vgg"
    return "alex"


def is_untrained(weights_path: str) -> bool:
    """True when the npz was produced by synthesize_lpips_weights — results
    computed with it must be labeled (not comparable to published LPIPS)."""
    with np.load(weights_path) as data:
        return bool(data.get("__untrained__", np.zeros(1))[0])


def _vgg_features(data: dict):
    convs = [[(jnp.asarray(data[f"features.{i}.weight"]),
               jnp.asarray(data[f"features.{i}.bias"])) for i in block]
             for block in _VGG16_SLICES]

    def features(x):
        feats = []
        for bi, block in enumerate(convs):
            for w, b in block:
                x = jax.nn.relu(_conv(x, w, b))
            feats.append(x)
            if bi < len(convs) - 1:
                x = _maxpool(x)
        return feats

    return features


def _alex_features(data: dict):
    convs = [(jnp.asarray(data[f"features.{i}.weight"]),
              jnp.asarray(data[f"features.{i}.bias"]), s, p)
             for (i, _, _, s, p) in _ALEX_CONVS]

    def features(x):
        feats = []
        for ci, (w, b, s, p) in enumerate(convs):
            x = jax.nn.relu(_conv(x, w, b, stride=s, pad=p))
            feats.append(x)
            if ci in _ALEX_POOL_AFTER:
                x = _maxpool(x, k=3, s=2)
        return feats

    return features


def _squeeze_features(data: dict):
    def p(name):
        return (jnp.asarray(data[f"{name}.weight"]),
                jnp.asarray(data[f"{name}.bias"]))

    conv0 = p("features.0")
    fires = {i: (p(f"features.{i}.squeeze"), p(f"features.{i}.expand1x1"),
                 p(f"features.{i}.expand3x3")) for (i, _, _) in _SQUEEZE_FIRES}

    def fire(x, mod):
        (sw, sb), (e1w, e1b), (e3w, e3b) = mod
        s = jax.nn.relu(_conv(x, sw, sb, pad=0))
        e1 = jax.nn.relu(_conv(s, e1w, e1b, pad=0))
        e3 = jax.nn.relu(_conv(s, e3w, e3b, pad=1))
        return jnp.concatenate([e1, e3], axis=1)

    def features(x):
        feats = []
        x = jax.nn.relu(_conv(x, *conv0, stride=2, pad=0))
        for idx in range(1, 13):
            if idx in fires:
                x = fire(x, fires[idx])
            if idx in _SQUEEZE_TAPS:
                feats.append(x)
            if idx in _SQUEEZE_POOL_AFTER:
                x = _maxpool(x, k=3, s=2, ceil=True)
        return feats

    return features


_FEATURES = {"vgg": _vgg_features, "alex": _alex_features,
             "squeeze": _squeeze_features}


def load_lpips(weights_path: str, net_type: str | None = None) -> Callable:
    """Returns lpips(x, y) for (3,H,W) or (B,3,H,W) images in [0,1]."""
    data = dict(np.load(weights_path))
    net = net_type or _detect_net(data)
    features_raw = _FEATURES[net](data)
    lins = [jnp.asarray(data[f"lin{k}.model.1.weight"]).reshape(1, -1, 1, 1)
            for k in range(len(LIN_CHANNELS[net]))]

    @jax.jit
    def features(x):
        x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / \
            jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        return features_raw(x)

    @jax.jit
    def lpips(x, y):
        """x, y in [0, 1] — fed to z_score DIRECTLY, matching the reference
        pipeline (lpipsPyTorch/modules/networks.py:49-53 applies the
        [-1,1]-calibrated shift/scale to whatever it receives, and
        metrics.py:31-32 passes to_tensor() images in [0,1] — there is no
        2x-1 mapping anywhere in the reference)."""
        if x.ndim == 3:
            x, y = x[None], y[None]
        fx, fy = features(x), features(y)
        val = 0.0
        for k, (a, b) in enumerate(zip(fx, fy)):
            d = (_normalize(a) - _normalize(b)) ** 2
            val = val + (lins[k] * d).sum(axis=1, keepdims=True).mean(
                axis=(2, 3))
        return val.reshape(())

    return lpips


def synthesize_lpips_weights(out_path: str, net_type: str = "vgg",
                             seed: int = 0) -> None:
    """Write a DETERMINISTIC He-initialized backbone npz.

    The sandbox cannot download pretrained weights (zero egress); this
    produces the one documented stand-in artifact: random-feature perceptual
    distance over the exact LPIPS architecture, reproducible from the seed.
    Results computed with it are flagged via ``is_untrained`` and must be
    labeled '(untrained <net> seed<k>)' — NOT comparable to published LPIPS.
    """
    rng = np.random.default_rng(seed)

    def he(o, i, k):
        std = float(np.sqrt(2.0 / (i * k * k)))
        return rng.normal(0.0, std, size=(o, i, k, k)).astype(np.float32)

    arrs = {}
    if net_type == "vgg":
        in_ch = 3
        for i, o in zip([i for b in _VGG16_SLICES for i in b], _VGG16_CH):
            arrs[f"features.{i}.weight"] = he(o, in_ch, 3)
            arrs[f"features.{i}.bias"] = np.zeros(o, np.float32)
            in_ch = o
    elif net_type == "alex":
        in_ch = 3
        for (i, o, k, _, _) in _ALEX_CONVS:
            arrs[f"features.{i}.weight"] = he(o, in_ch, k)
            arrs[f"features.{i}.bias"] = np.zeros(o, np.float32)
            in_ch = o
    elif net_type == "squeeze":
        arrs["features.0.weight"] = he(64, 3, 3)
        arrs["features.0.bias"] = np.zeros(64, np.float32)
        in_ch = 64
        for (i, s, e) in _SQUEEZE_FIRES:
            arrs[f"features.{i}.squeeze.weight"] = he(s, in_ch, 1)
            arrs[f"features.{i}.squeeze.bias"] = np.zeros(s, np.float32)
            arrs[f"features.{i}.expand1x1.weight"] = he(e, s, 1)
            arrs[f"features.{i}.expand1x1.bias"] = np.zeros(e, np.float32)
            arrs[f"features.{i}.expand3x3.weight"] = he(e, s, 3)
            arrs[f"features.{i}.expand3x3.bias"] = np.zeros(e, np.float32)
            in_ch = 2 * e
    else:
        raise ValueError(net_type)
    for k, c in enumerate(LIN_CHANNELS[net_type]):
        arrs[f"lin{k}.model.1.weight"] = np.full((1, c, 1, 1),
                                                 1.0 / c, np.float32)
    arrs["__net__"] = np.frombuffer(net_type.encode(), np.uint8)
    arrs["__untrained__"] = np.ones(1, np.int8)
    np.savez(out_path, **arrs)


def default_weights(net_type: str = "vgg", seed: int = 0) -> str:
    """Path to the synthesized stand-in artifact, created on first use
    (cached under the package's .lpips_cache)."""
    import os

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".lpips_cache")
    os.makedirs(cache, exist_ok=True)
    path = os.path.join(cache, f"lpips_{net_type}_seed{seed}.npz")
    if not os.path.exists(path):
        synthesize_lpips_weights(path, net_type, seed)
    return path


def convert_torch_weights(out_path: str) -> None:
    """Convert an installed lpips package's VGG model to our npz (needs the
    ``lpips`` package + its downloaded weights; run outside the sandbox).
    For converting raw checkpoint FILES without any lpips/torchvision
    install, use ``scripts/convert_lpips_weights.py`` instead."""
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="vgg")
    arrs = {}
    for name, t in net.net.named_parameters():
        # lpips wraps torchvision vgg16 features as net.slice1..slice5 but
        # keeps the ORIGINAL torchvision layer indices inside each slice
        # (slice2.5.weight == features.5.weight), so stripping the slice
        # prefix recovers the schema load_lpips expects.
        idx_suffix = name.split(".", 1)[1]          # "<i>.weight|bias"
        arrs[f"features.{idx_suffix}"] = t.detach().numpy()
    for k in range(5):
        arrs[f"lin{k}.model.1.weight"] = (
            getattr(net, f"lin{k}").model[1].weight.detach().numpy())
    np.savez(out_path, **arrs)
