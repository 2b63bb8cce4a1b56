#!/usr/bin/env python
"""Generate the reference-layout Gaussian PLY fixtures.

Byte-for-byte the format the reference's GaussianModel.save_ply emits via
plyfile (scene/gaussian_model.py:212-293): binary_little_endian 1.0, one
`vertex` element, float32 properties in the exact order
x,y,z,nx,ny,nz,f_dc_0..2,f_rest_0..3*((D+1)^2-1)-1,opacity,scale_0..2,
rot_0..3 [, which_object]. Written with a hand-rolled writer (NOT our
serialization module) so the fixture is an independent pin of the format.

Run from the repo root: python tests/fixtures/make_ref_ply.py
"""
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write_ref_ply(path, n, sh_degree, with_which_object, seed):
    rng = np.random.default_rng(seed)
    k1 = (sh_degree + 1) ** 2
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(3 * (k1 - 1))]
             + ["opacity"] + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    if with_which_object:
        names.append("which_object")
    cols = {}
    for nm in names:
        if nm in ("nx", "ny", "nz"):
            cols[nm] = np.zeros(n, np.float32)       # reference zeros normals
        elif nm == "which_object":
            cols[nm] = rng.integers(0, 4, n).astype(np.float32)
        elif nm.startswith("scale_"):
            cols[nm] = rng.uniform(-5, -1, n).astype(np.float32)  # log scales
        elif nm == "opacity":
            cols[nm] = rng.normal(size=n).astype(np.float32)      # logits
        else:
            cols[nm] = rng.normal(size=n).astype(np.float32)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    body = np.stack([cols[nm] for nm in names], axis=1).astype("<f4")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(body.tobytes())
    return cols


if __name__ == "__main__":
    write_ref_ply(os.path.join(HERE, "point_cloud_ref.ply"),
                  n=16, sh_degree=3, with_which_object=False, seed=11)
    write_ref_ply(os.path.join(HERE, "wheat_head_ref.ply"),
                  n=12, sh_degree=3, with_which_object=True, seed=12)
    print("fixtures written")
