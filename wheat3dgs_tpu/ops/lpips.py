"""LPIPS perceptual metric (reference: lpipsPyTorch/, VGG backbone).

The reference downloads pretrained VGG weights at runtime
(lpipsPyTorch/modules/utils.py:12-30); this sandbox has zero egress, so the
metric is only available when a converted weights file is supplied. The
implementation itself is complete: a pure-JAX VGG16 feature trunk with the
LPIPS unit-normalize + linear-head distance, numerically matching the
torch reference given the same weights.

Weights file format (npz): conv kernels `features.<i>.weight` (OIHW) /
`features.<i>.bias` from torchvision VGG16, and LPIPS heads
`lin<k>.model.1.weight` from richzhang/PerceptualSimilarity. Use
`convert_torch_weights` to produce it on a machine that has them.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 conv layer indices per block (through relu x_2 slices).
_VGG16_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b.reshape(1, -1, 1, 1)


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt((feat ** 2).sum(axis=1, keepdims=True))
    return feat / (norm + eps)


def load_lpips(weights_path: str) -> Callable:
    """Returns lpips(x, y) for (3,H,W) or (B,3,H,W) images in [0,1]."""
    data = dict(np.load(weights_path))
    convs = []
    for block in _VGG16_SLICES:
        convs.append([(jnp.asarray(data[f"features.{i}.weight"]),
                       jnp.asarray(data[f"features.{i}.bias"])) for i in block])
    lins = [jnp.asarray(data[f"lin{k}.model.1.weight"]).reshape(1, -1, 1, 1)
            for k in range(5)]

    @jax.jit
    def features(x):
        x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / \
            jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        feats = []
        for bi, block in enumerate(convs):
            for w, b in block:
                x = jax.nn.relu(_conv(x, w, b))
            feats.append(x)
            if bi < len(convs) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID")
        return feats

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
