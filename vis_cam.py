#!/usr/bin/env python
"""3D camera-pose visualizer (reference: vis_cam.py): plots COLMAP camera
frustums + the sparse point cloud to a PNG (matplotlib Agg — headless)."""

import os
from argparse import ArgumentParser

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from wheat3dgs_tpu.io import colmap  # noqa: E402
from wheat3dgs_tpu.utils import graphics  # noqa: E402


def frustum_corners(w2c: np.ndarray, scale: float = 0.2) -> np.ndarray:
    """5 points: camera center + 4 image-plane corners in world space."""
    c2w = np.linalg.inv(w2c)
    corners_cam = np.array(
        [[0, 0, 0], [-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]],
        np.float64) * scale
    hom = np.concatenate([corners_cam, np.ones((5, 1))], axis=1)
    return (hom @ c2w.T)[:, :3]


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--output", "-o", default="cameras.png")
    parser.add_argument("--scale", type=float, default=0.2)
    args = parser.parse_args(argv)

    sparse = os.path.join(args.source_path, "sparse", "0")
    intr, extr, points = colmap.load_colmap_model(sparse)

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(111, projection="3d")
    if points is not None:
        xyz, rgb, _ = points
        sub = xyz[:: max(1, len(xyz) // 5000)]
        ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.5, c="gray",
                   alpha=0.3)
    for img in extr.values():
        R = graphics.qvec_to_rotmat(img.qvec)
        w2c = np.eye(4)
        w2c[:3, :3] = R
        w2c[:3, 3] = img.tvec
        c = frustum_corners(w2c, args.scale)
        cam_id = int(img.name.split("_")[-1].split(".")[0]) \
            if img.name.split("_")[-1].split(".")[0].isdigit() else 0
        color = "red" if cam_id > 10 else "blue"   # test vs train split
        for k in range(1, 5):
            ax.plot(*zip(c[0], c[k]), c=color, lw=0.8)
        loop = [1, 2, 3, 4, 1]
        ax.plot(c[loop, 0], c[loop, 1], c[loop, 2], c=color, lw=0.8)
        ax.text(*c[0], img.name.split(".")[0].split("_")[-1], fontsize=6)
    ax.set_title(f"{len(extr)} cameras (blue=train, red=test)")
    fig.savefig(args.output, dpi=150, bbox_inches="tight")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
