"""Binary PLY read/write without external deps (reference uses `plyfile`;
layout must stay bit-compatible with scene/gaussian_model.py:212-293).

Supports binary_little_endian 1.0 and ascii, float/uchar/int properties —
enough for 3DGS point_cloud.ply (with the wheat `which_object` f4 channel),
COLMAP-exported input.ply, and per-head wh_*.ply files.
"""

from __future__ import annotations

import io
import os
from typing import Dict, List, Tuple

import numpy as np

_PLY_DTYPES = {
    "float": "<f4", "float32": "<f4", "double": "<f8", "float64": "<f8",
    "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
    "short": "<i2", "int16": "<i2", "ushort": "<u2", "uint16": "<u2",
    "int": "<i4", "int32": "<i4", "uint": "<u4", "uint32": "<u4",
}
_INV_PLY_DTYPES = {
    np.dtype("<f4"): "float", np.dtype("<f8"): "double",
    np.dtype("u1"): "uchar", np.dtype("i1"): "char",
    np.dtype("<i2"): "short", np.dtype("<u2"): "ushort",
    np.dtype("<i4"): "int", np.dtype("<u4"): "uint",
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Read the `vertex` element of a PLY file -> {property: (N,) array}."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    if not header or header[0].strip() != "ply":
        raise ValueError(f"{path}: missing ply magic")
    fmt = None
    elements: List[Tuple[str, int, List[Tuple[str, str]]]] = []
    for line in header[1:]:
        parts = line.strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                raise ValueError(f"{path}: list properties unsupported")
            elements[-1][2].append((parts[2], parts[1]))

    if fmt not in ("binary_little_endian", "ascii"):
        raise ValueError(f"{path}: unsupported format {fmt}")

    out: Dict[str, np.ndarray] = {}
    offset = 0
    if fmt == "ascii":
        text_rows = body.decode("ascii").split("\n")
        row_idx = 0
        for name, count, props in elements:
            arr = np.loadtxt(
                io.StringIO("\n".join(text_rows[row_idx:row_idx + count])),
                dtype=np.float64, ndmin=2)
            row_idx += count
            if name == "vertex":
                for i, (pname, ptype) in enumerate(props):
                    out[pname] = arr[:, i].astype(_PLY_DTYPES[ptype])
        return out

    for name, count, props in elements:
        dtype = np.dtype([(p, _PLY_DTYPES[t]) for p, t in props])
        nbytes = dtype.itemsize * count
        if name == "vertex":
            rec = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
            for pname, _ in props:
                out[pname] = np.ascontiguousarray(rec[pname])
        offset += nbytes
    return out


def write_ply(path: str, props: Dict[str, np.ndarray]) -> None:
    """Write a binary_little_endian PLY with a single `vertex` element.

    Property order follows dict insertion order; all arrays must share length.
    """
    names = list(props.keys())
    n = len(next(iter(props.values())))
    cols = []
    for name in names:
        a = np.asarray(props[name])
        if a.ndim != 1 or len(a) != n:
            raise ValueError(f"property {name}: expected shape ({n},), got {a.shape}")
        if a.dtype not in _INV_PLY_DTYPES:
            a = a.astype("<f4")
        cols.append(a)
    dtype = np.dtype([(nm, c.dtype) for nm, c in zip(names, cols)])
    rec = np.empty(n, dtype=dtype)
    for nm, c in zip(names, cols):
        rec[nm] = c

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for nm, c in zip(names, cols):
            f.write(f"property {_INV_PLY_DTYPES[c.dtype]} {nm}\n".encode())
        f.write(b"end_header\n")
        f.write(rec.tobytes())


def read_points_ply(path: str):
    """Read xyz/rgb/normals point cloud (reference fetchPly,
    scene/dataset_readers.py:126-134)."""
    from ..utils.graphics import BasicPointCloud

    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float64)
    if "red" in v:
        colors = np.stack([v["red"], v["green"], v["blue"]], axis=1) / 255.0
    else:
        colors = np.ones_like(pts) * 0.5
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float64)
    else:
        normals = np.zeros_like(pts)
    return BasicPointCloud(points=pts, colors=colors, normals=normals)


def write_points_ply(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """Write xyz + uint8 rgb + zero normals (reference storePly,
    scene/dataset_readers.py:136-148)."""
    zeros = np.zeros(len(xyz), dtype="<f4")
    write_ply(path, {
        "x": xyz[:, 0].astype("<f4"), "y": xyz[:, 1].astype("<f4"),
        "z": xyz[:, 2].astype("<f4"),
        "nx": zeros, "ny": zeros, "nz": zeros,
        "red": rgb[:, 0].astype("u1"), "green": rgb[:, 1].astype("u1"),
        "blue": rgb[:, 2].astype("u1"),
    })
