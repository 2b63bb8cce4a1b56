"""Structural trait extraction (reference:
wheatheadsmorphology/traits_extraction_functions.py).

Traits per head:
  length      — integrated arc length of a smoothing spline fitted to the
                point cloud projected onto the PCA P1-P2 plane;
  width       — 2x the distance_percentile of point-to-(P1,P2)-plane distances;
  volume      — convex-hull volume (scipy Qhull; the reference calls the same
                Qhull through open3d);
  curvature   — spline length / chord length;
  inclination — angle between PCA-1 and the world Z axis, degrees.
"""

from __future__ import annotations

import numpy as np
from scipy.interpolate import splev, splrep


def run_pca(data: np.ndarray):
    from sklearn.decomposition import PCA

    pts = data[:, :3]
    centered = pts - pts.mean(axis=0)
    pca = PCA(n_components=3)
    pca.fit(centered)
    return pca.transform(centered), pca


def compute_length(pcd_pca_3d: np.ndarray, splines_smoothing_value: float):
    xy = pcd_pca_3d[:, :2]
    order = np.argsort(xy[:, 0])
    x_sorted, y_sorted = xy[order, 0], xy[order, 1]
    tck = splrep(x_sorted, y_sorted, s=splines_smoothing_value)
    x_fine = np.linspace(np.percentile(x_sorted, 0.5),
                         np.percentile(x_sorted, 99.5), 1000)
    y_fine = splev(x_fine, tck)
    axis_pts = np.stack([x_fine, y_fine], axis=1)
    seg = np.diff(axis_pts, axis=0)
    length = float(np.linalg.norm(seg, axis=1).sum())
    return length, tck, axis_pts


def compute_curvature(length: float, axis_pts: np.ndarray) -> float:
    chord = float(np.linalg.norm(axis_pts[-1] - axis_pts[0]))
    return length / chord


def compute_inclination_angle(pca) -> float:
    p1 = pca.components_[0]
    cosang = np.dot(p1 / np.linalg.norm(p1), np.array([0.0, 0.0, 1.0]))
    return float(np.degrees(np.arccos(cosang)))


def convex_hull_volume(data: np.ndarray) -> float:
    from scipy.spatial import ConvexHull

    return float(ConvexHull(data[:, :3]).volume)


def compute_width_pca(data: np.ndarray, percentile: float = 95) -> float:
    from sklearn.decomposition import PCA

    pts = data[:, :3]
    centered = pts - pts.mean(axis=0)
    pca = PCA(n_components=3)
    pca.fit(centered)
    normal = pca.components_[2]
    dist = np.abs(centered @ normal)
    return float(2.0 * np.percentile(dist, percentile))


def compute_traits(data: np.ndarray, distance_percentile: float,
                   splines_smoothing_value: float) -> list:
    pcd_pca_3d, pca = run_pca(data)
    length, _, axis_pts = compute_length(pcd_pca_3d, splines_smoothing_value)
    curvature = compute_curvature(length, axis_pts)
    width = compute_width_pca(data, percentile=distance_percentile)
    try:
        volume = convex_hull_volume(data)
    except Exception as e:  # degenerate clouds (reference behaves the same)
        volume = 0
        print(f"Error estimating volume: {e}")
    inclination = compute_inclination_angle(pca)
    return [length, width, volume, inclination, curvature]
