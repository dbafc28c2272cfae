"""Tests for AgglomerativeBregman and SpectralClustering."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.agglomerative import AgglomerativeBregman
from generalized_kmeans_clustering_spark.spectral import SpectralClustering


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(71)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (30, 2)),
        rng.normal([6.0, 0.0], 0.3, (30, 2)),
        rng.normal([3.0, 5.0], 0.3, (30, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


@pytest.mark.parametrize("linkage", ["single", "complete", "average", "ward"])
def test_agglomerative_linkages_recover_blobs(spark, blobs, linkage):
    df, pts = blobs
    m = AgglomerativeBregman(num_clusters=3, linkage=linkage).fit(df)
    assert m.k == 3
    assert sorted(m.summary.cluster_sizes) == [30, 30, 30]
    # training labels align with ground truth up to permutation
    lbl = m.training_labels
    for lo in (0, 30, 60):
        grp = lbl[lo:lo + 30]
        assert (grp == grp[0]).all()


def test_agglomerative_distance_threshold(spark, blobs):
    df, _ = blobs
    # tiny threshold → merging stops early → many clusters
    m = AgglomerativeBregman(
        num_clusters=1, distance_threshold=1e-6, linkage="average"
    ).fit(df)
    assert m.k > 10
    # merge distances recorded monotone-ish and positive
    assert all(s.distance >= 0 for s in m.merge_steps)


def test_agglomerative_ward_requires_se():
    with pytest.raises(ValueError):
        AgglomerativeBregman(linkage="ward", divergence="kl")


def test_spectral_rings_exact(spark):
    rng = np.random.default_rng(73)
    t1 = rng.uniform(0, 2 * np.pi, 70)
    t2 = rng.uniform(0, 2 * np.pi, 70)
    inner = np.c_[np.cos(t1), np.sin(t1)] + rng.normal(0, 0.05, (70, 2))
    outer = np.c_[np.cos(t2), np.sin(t2)] * 5.0 + rng.normal(0, 0.05, (70, 2))
    pts = np.concatenate([inner, outer])
    truth = np.array([0] * 70 + [1] * 70)
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    m = SpectralClustering(
        k=2, kernel_type="rbf", gamma=2.0, affinity_type="knn",
        num_neighbors=10, seed=75,
    ).fit(df)
    pred = m.training_labels
    agree = max((pred == truth).mean(), (pred == 1 - truth).mean())
    assert agree > 0.95


@pytest.mark.parametrize("lap", ["unnormalized", "symmetric", "randomwalk"])
def test_spectral_laplacians_split_blobs(spark, blobs, lap):
    df, pts = blobs
    m = SpectralClustering(
        k=3, kernel_type="rbf", gamma=1.0, laplacian_type=lap, seed=77
    ).fit(df)
    lbl = m.training_labels
    for lo in (0, 30, 60):
        grp = lbl[lo:lo + 30]
        # each blob ends up (almost) entirely in one cluster
        counts = np.bincount(grp, minlength=3)
        assert counts.max() >= 28


def test_spectral_nystrom_path(spark, blobs):
    df, pts = blobs
    m = SpectralClustering(
        k=3, kernel_type="rbf", gamma=1.0, use_nystrom=True,
        num_landmarks=40, seed=79,
    ).fit(df)
    assert m.params["useNystrom"] is True
    out = m.transform(df)
    assert out.select("prediction").distinct().count() >= 2
    sizes = [r["n"] for r in out.groupBy("prediction")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert sum(sizes) == len(pts)


def test_spectral_epsilon_distributed_recovers_blobs(spark, blobs):
    """Distributed epsilon-graph path (never collects the feature
    column) recovers the same well-separated partition as the exact
    driver-side path — parity up to label permutation."""
    df, pts = blobs
    exact = SpectralClustering(
        k=3, kernel_type="rbf", gamma=1.0, affinity_type="epsilon",
        epsilon=0.01, use_nystrom=False, seed=83,
    ).fit(df)
    dist = SpectralClustering(
        k=3, kernel_type="rbf", gamma=1.0, affinity_type="epsilon",
        epsilon=0.01, use_nystrom=True, num_landmarks=60, seed=83,
    ).fit(df)
    assert dist.params.get("distributedGraph") is True
    # both paths must carve each blob into a single cluster
    lbl_e = exact.training_labels
    rows = dist.training_assignments.orderBy("_sid").collect()
    lbl_d = np.array([r["prediction"] for r in rows])
    assert len(lbl_d) == len(pts)
    for lbl in (lbl_e, lbl_d):
        for lo in (0, 30, 60):
            counts = np.bincount(lbl[lo:lo + 30], minlength=3)
            assert counts.max() >= 28
    # the two paths agree as partitions (same blobs together)
    from itertools import permutations
    agree = max(
        (np.array([p[v] for v in lbl_d]) == lbl_e).mean()
        for p in permutations(range(3))
    )
    assert agree >= 28 * 3 / 90


def test_spectral_epsilon_distributed_transform_and_sizes(spark, blobs):
    df, pts = blobs
    m = SpectralClustering(
        k=3, kernel_type="rbf", gamma=1.0, affinity_type="epsilon",
        epsilon=0.01, use_nystrom=True, num_landmarks=50, seed=85,
    ).fit(df)
    assert sorted(m.summary.cluster_sizes) == [30, 30, 30]
    out = m.transform(df)  # nearest input-space centroid
    sizes = sorted(
        r["n"] for r in out.groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert sizes == [30, 30, 30]


def test_spectral_epsilon_distributed_guards(spark, blobs):
    df, _ = blobs
    with pytest.raises(ValueError, match="rbf"):
        SpectralClustering(
            k=3, kernel_type="linear", affinity_type="epsilon",
            epsilon=0.5)._fit_epsilon_distributed(df, 90, 0.0)
    with pytest.raises(ValueError, match="symmetric"):
        SpectralClustering(
            k=3, kernel_type="rbf", laplacian_type="randomwalk",
            affinity_type="epsilon",
            epsilon=0.5)._fit_epsilon_distributed(df, 90, 0.0)
    with pytest.raises(ValueError, match="epsilon"):
        SpectralClustering(
            k=3, kernel_type="rbf", affinity_type="epsilon",
            epsilon=0.0)._fit_epsilon_distributed(df, 90, 0.0)
