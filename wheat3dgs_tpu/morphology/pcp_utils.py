"""Point-cloud pre-processing (reference:
wheatheadsmorphology/point_cloud_processing_utils.py)."""

from __future__ import annotations

import numpy as np
from scipy import stats


def subsample_pcd(data: np.ndarray, subsampling_threshold: int,
                  rng=None) -> np.ndarray:
    if data.shape[0] > subsampling_threshold:
        rng = rng or np.random
        idx = rng.choice(data.shape[0], subsampling_threshold, replace=False)
        return data[idx]
    return data


def main_cluster_extraction(data: np.ndarray,
                            clusterer_definition: dict) -> np.ndarray:
    """Keep only the largest DBSCAN/HDBSCAN cluster (reference :55-84).
    HDBSCAN comes from sklearn (the external hdbscan package is absent)."""
    from sklearn.cluster import DBSCAN, HDBSCAN

    kind = clusterer_definition["type"]
    min_samples = clusterer_definition.get("min_samples")
    if kind == "dbscan":
        clusterer = DBSCAN(eps=clusterer_definition["epsilon"],
                           min_samples=min_samples)
    elif kind == "hdbscan":
        clusterer = HDBSCAN(
            min_cluster_size=clusterer_definition["min_cluster_size"],
            min_samples=min_samples,
            allow_single_cluster=True,
            cluster_selection_epsilon=clusterer_definition["epsilon_hdbscan"])
    else:
        raise ValueError(f"unknown clusterer type {kind!r}")
    labels = clusterer.fit_predict(data[:, :3])
    unique, counts = np.unique(labels, return_counts=True)
    largest = unique[np.argmax(counts)]
    return data[labels == largest]


def statistical_outlier_removal(data: np.ndarray, k: int = 10,
                                std_ratio: float = 2.0):
    """Robust (median/MAD) SOR filter (reference :11-42): drop points whose
    mean k-NN distance exceeds median + std_ratio * (MAD * 1.4826)."""
    from sklearn.neighbors import NearestNeighbors

    pts = data[:, :3]
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(pts)
    dists, _ = nbrs.kneighbors(pts)
    avg = dists[:, 1:].mean(axis=1)
    med = np.median(avg)
    mad = stats.median_abs_deviation(avg) * 1.4826
    mask = avg < med + std_ratio * mad
    return data[mask], data[~mask]
