"""Unit tests for the jitted Lloyd's k-means (ops/kmeans.py)."""

import numpy as np

from fast_plaid_tpu.ops import kmeans


def _clustered_data(rng, n_clusters, per, dim, spread=0.05):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 3
    pts = centers[np.repeat(np.arange(n_clusters), per)] + spread * (
        rng.standard_normal((n_clusters * per, dim)).astype(np.float32)
    )
    return pts, centers


def test_recovers_separated_clusters():
    rng = np.random.default_rng(0)
    pts, centers = _clustered_data(rng, 8, 64, 16)
    got = kmeans.train_kmeans(pts, k=8, niters=8, seed=0, normalize=False)
    # Lloyd's with random init may merge a couple of clusters (the
    # reference's fastkmeans behaves the same); require most centers
    # recovered and a low quantization error overall.
    d = np.linalg.norm(centers[:, None, :] - got[None, :, :], axis=-1)
    assert (d.min(axis=1) < 0.5).sum() >= 6
    pt_d = np.linalg.norm(pts[:, None, :] - got[None, :, :], axis=-1).min(1)
    assert np.median(pt_d) < 0.5


def test_deterministic_and_normalized():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((500, 8)).astype(np.float32)
    a = kmeans.train_kmeans(pts, k=16, niters=3, seed=7)
    b = kmeans.train_kmeans(pts, k=16, niters=3, seed=7)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(np.linalg.norm(a, axis=-1), 1.0, atol=1e-5)


def test_k_capped_at_points():
    rng = np.random.default_rng(2)
    pts = rng.standard_normal((10, 4)).astype(np.float32)
    got = kmeans.train_kmeans(pts, k=64, niters=2, seed=0)
    assert got.shape == (10, 4)


def test_max_points_subsampling():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((4096, 8)).astype(np.float32)
    got = kmeans.train_kmeans(
        pts, k=4, niters=2, seed=0, max_points_per_centroid=16
    )
    assert got.shape == (4, 8)
    assert np.isfinite(got).all()


def test_heuristics():
    assert kmeans.num_partitions_heuristic(1_000_000) == 2 ** int(
        np.floor(np.log2(16_000))
    )
    assert kmeans.sample_size_heuristic(100) == min(
        1 + int(16 * np.sqrt(12_000)), 100
    )
