#!/usr/bin/env python
"""Convert torch LPIPS-VGG checkpoints to the npz schema ops/lpips.py loads.

The reference computes LPIPS with pretrained weights fetched at runtime
(reference lpipsPyTorch/modules/utils.py:12-30 + torchvision VGG16); this
sandbox has zero egress, so wheat3dgs_tpu loads them from a single npz
instead. Run this converter on any machine that has the two standard
checkpoint files and drop the npz next to your model (or pass
``--lpips_weights`` to metrics_app):

  python scripts/convert_lpips_weights.py \
      --vgg  ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
      --lin  ~/.cache/torch/hub/checkpoints/vgg.pth \
      --out  lpips_vgg.npz

Inputs (plain ``torch.load``-able state dicts — torchvision/lpips packages
are NOT required):
  --vgg  torchvision VGG16 ImageNet checkpoint (keys ``features.<i>.weight``
         / ``.bias`` — the 13 conv layers at indices 0,2,5,7,10,12,14,17,
         19,21,24,26,28).
  --lin  LPIPS linear-head checkpoint from richzhang/PerceptualSimilarity
         (keys ``lin<k>.model.1.weight``, k = 0..4). Optional: with
         ``--lin none`` the heads default to all-ones (a valid but
         uncalibrated perceptual distance — NOT comparable to published
         LPIPS numbers).

Output npz schema (consumed by wheat3dgs_tpu.ops.lpips.load_lpips):
  features.<i>.weight  (O, I, 3, 3) float32 conv kernels, OIHW
  features.<i>.bias    (O,) float32
  lin<k>.model.1.weight  (1, C_k, 1, 1) float32 LPIPS heads
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
LIN_CHANNELS = (64, 128, 256, 512, 512)


def _load_state_dict(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else
            np.asarray(v) for k, v in sd.items()}


def convert(vgg_path: str, lin_path: str | None, out_path: str) -> dict:
    vgg = _load_state_dict(vgg_path)
    arrs = {}
    for i in VGG16_CONV_IDX:
        for suffix in ("weight", "bias"):
            key = f"features.{i}.{suffix}"
            # Accept both torchvision layout and lpips-package slices
            # (slice1.0.weight style), mapping the latter onto features.*.
            if key in vgg:
                arrs[key] = np.asarray(vgg[key], np.float32)
            else:
                raise KeyError(
                    f"{key} missing from {vgg_path} — expected a "
                    "torchvision VGG16 state dict")
    if lin_path:
        lin = _load_state_dict(lin_path)
        for k in range(5):
            lk = f"lin{k}.model.1.weight"
            cand = [n for n in lin if n.endswith(lk) or n == lk]
            if not cand:
                raise KeyError(f"{lk} missing from {lin_path}")
            arrs[lk] = np.asarray(lin[cand[0]], np.float32).reshape(
                1, LIN_CHANNELS[k], 1, 1)
    else:
        for k in range(5):
            arrs[f"lin{k}.model.1.weight"] = np.ones(
                (1, LIN_CHANNELS[k], 1, 1), np.float32)
    validate(arrs)
    np.savez(out_path, **arrs)
    return arrs


def validate(arrs: dict) -> None:
    """Schema check: the exact keys/shapes load_lpips consumes."""
    in_ch = 3
    for i, o_ch in zip(VGG16_CONV_IDX,
                       (64, 64, 128, 128, 256, 256, 256,
                        512, 512, 512, 512, 512, 512)):
        w = arrs[f"features.{i}.weight"]
        b = arrs[f"features.{i}.bias"]
        assert w.shape == (o_ch, in_ch, 3, 3), (i, w.shape)
        assert b.shape == (o_ch,), (i, b.shape)
        in_ch = o_ch
    for k, c in enumerate(LIN_CHANNELS):
        assert arrs[f"lin{k}.model.1.weight"].shape == (1, c, 1, 1)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16-*.pth state dict")
    ap.add_argument("--lin", default=None,
                    help="LPIPS lin-head vgg.pth ('none' => all-ones heads)")
    ap.add_argument("--out", required=True, help="output npz path")
    args = ap.parse_args(argv)
    lin = None if args.lin in (None, "none") else args.lin
    convert(args.vgg, lin, args.out)
    print(f"wrote {args.out}")
    if lin is None:
        print("WARNING: all-ones lin heads — distances are not comparable "
              "to published LPIPS numbers", file=sys.stderr)


if __name__ == "__main__":
    main()
