"""Tests for KMedoids/CLARA, Mercer kernels, KernelKMeans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions.mercer import get_mercer_kernel
from generalized_kmeans_clustering_spark.kmedoids import KMedoids, CLARA, pam
from generalized_kmeans_clustering_spark.kernel_kmeans import KernelKMeans


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(51)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.4, (40, 2)),
        rng.normal([8.0, 8.0], 0.4, (40, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


def test_mercer_kernels_math():
    X = np.array([[1.0, 0.0], [0.0, 1.0]])
    lin = get_mercer_kernel("linear").gram(X)
    assert lin == pytest.approx(np.array([[1.0, 0.0], [0.0, 1.0]]))
    rbf = get_mercer_kernel("rbf", gamma=0.5).gram(X)
    assert rbf[0, 0] == pytest.approx(1.0)
    assert rbf[0, 1] == pytest.approx(np.exp(-0.5 * 2.0))
    poly = get_mercer_kernel("polynomial", gamma=1.0, coef0=1.0, degree=2).gram(X)
    assert poly[0, 1] == pytest.approx(1.0)  # (0+1)^2
    lap = get_mercer_kernel("laplacian", gamma=1.0).gram(X)
    assert lap[0, 1] == pytest.approx(np.exp(-2.0))
    with pytest.raises(ValueError):
        get_mercer_kernel("nope")


def test_pam_finds_central_medoids():
    rng = np.random.default_rng(53)
    X = np.concatenate([
        rng.normal([0, 0], 0.3, (30, 2)), rng.normal([5, 5], 0.3, (30, 2)),
    ])
    medoids, cost = pam(X, 2)
    M = X[medoids]
    assert min(np.linalg.norm(M - [0, 0], axis=1)) < 1.0
    assert min(np.linalg.norm(M - [5, 5], axis=1)) < 1.0
    assert cost > 0
    # medoids must be actual data points
    assert all(any(np.allclose(m, x) for x in X) for m in M)


def test_kmedoids_fit_transform(spark, blobs):
    df, pts = blobs
    m = KMedoids(k=2, seed=55).fit(df)
    assert m.k == 2
    # medoids are near blob centers and are real points
    assert min(np.linalg.norm(m.centers - [0, 0], axis=1).min(),
               np.linalg.norm(m.centers - [8, 8], axis=1).min()) < 1.0
    out = m.transform(df)
    sizes = sorted(r["n"] for r in out.groupBy("prediction")
                   .agg(F.count(F.lit(1)).alias("n")).collect())
    assert sizes == [40, 40]


def test_clara_matches_blob_structure(spark, blobs):
    df, pts = blobs
    m = CLARA(k=2, num_samples=3, sample_size=40, seed=57).fit(df)
    C = m.centers
    assert np.linalg.norm(C - [0, 0], axis=1).min() < 1.0
    assert np.linalg.norm(C - [8, 8], axis=1).min() < 1.0
    assert m.params["fullDataCost"] > 0


def test_kernel_kmeans_nonlinear_rings(spark):
    """Concentric rings: linear k-means fails, RBF kernel k-means splits."""
    rng = np.random.default_rng(59)
    t1 = rng.uniform(0, 2 * np.pi, 60)
    t2 = rng.uniform(0, 2 * np.pi, 60)
    inner = np.c_[np.cos(t1), np.sin(t1)] * 1.0 + rng.normal(0, 0.05, (60, 2))
    outer = np.c_[np.cos(t2), np.sin(t2)] * 5.0 + rng.normal(0, 0.05, (60, 2))
    pts = np.concatenate([inner, outer])
    truth = np.array([0] * 60 + [1] * 60)
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    m = KernelKMeans(k=2, kernel_type="rbf", gamma=0.5, max_iter=30, seed=61).fit(df)
    out = m.transform(df).select("prediction").collect()
    pred = np.array([r["prediction"] for r in out])
    agree = max((pred == truth).mean(), (pred == 1 - truth).mean())
    assert agree > 0.95
