"""Native C++ kNN (simple-knn parity) tests."""

import numpy as np
import pytest

from wheat3dgs_tpu import native


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_knn_exact():
    rng = np.random.default_rng(1)
    for pts in (rng.normal(size=(800, 3)),
                np.concatenate([rng.normal(0, 0.01, (400, 3)),
                                rng.normal(5, 1, (400, 3))])):
        pts = pts.astype(np.float32)
        got = native.knn_mean_sq_dist(pts, 3)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        want = np.sort(d2, 1)[:, :3].mean(1)
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.skipif(not native.available(), reason="g++ build unavailable")
def test_native_knn_matches_tpu_kernel():
    import jax.numpy as jnp

    from wheat3dgs_tpu.ops.knn import knn_mean_sq_dist

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    a = native.knn_mean_sq_dist(pts, 3)
    b = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, block=128))
    np.testing.assert_allclose(a, b, rtol=1e-4)
