"""Tests for variant estimators: Soft, Bisecting, XMeans, DPMeans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.soft_kmeans import SoftKMeans
from generalized_kmeans_clustering_spark.bisecting import BisectingKMeans
from generalized_kmeans_clustering_spark.xmeans import XMeans
from generalized_kmeans_clustering_spark.dpmeans import DPMeans


@pytest.fixture(scope="module")
def blobs3(spark):
    rng = np.random.default_rng(11)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.4, (70, 2)),
        rng.normal([12.0, 0.0], 0.4, (60, 2)),
        rng.normal([0.0, 12.0], 0.4, (50, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


def _recovers_blobs(centers, tol=1.5):
    expected = np.array([[0.0, 0.0], [12.0, 0.0], [0.0, 12.0]])
    hits = 0
    for e in expected:
        if np.min(np.linalg.norm(centers - e, axis=1)) < tol:
            hits += 1
    return hits == 3


# ---------------------------------------------------------------- Soft
def test_soft_kmeans_recovers_blobs_and_probabilities(spark, blobs3):
    df, pts = blobs3
    m = SoftKMeans(k=3, beta=2.0, max_iter=15, seed=3).fit(df)
    assert _recovers_blobs(m.centers)
    out = m.transform(df)
    row = out.select(
        F.aggregate("probability", F.lit(0.0), lambda a, v: a + v).alias("s")
    ).agg(F.min("s").alias("lo"), F.max("s").alias("hi")).collect()[0]
    assert row["lo"] == pytest.approx(1.0, abs=1e-9)
    assert row["hi"] == pytest.approx(1.0, abs=1e-9)
    # soft cost history should be non-increasing (fuzzy Lloyd monotone)
    h = m.summary.distortion_history
    assert all(h[i + 1] <= h[i] * (1 + 1e-9) for i in range(len(h) - 1))
    # hard prediction agrees with argmax probability
    mism = out.select(
        (F.col("prediction") !=
         (F.expr("array_position(probability, array_max(probability))") - 1)
         .cast("int")).cast("int").alias("bad")
    ).agg(F.sum("bad").alias("n")).collect()[0]["n"]
    assert mism == 0


def test_soft_predict_soft_sums_to_one(spark, blobs3):
    df, _ = blobs3
    m = SoftKMeans(k=3, beta=1.0, max_iter=5, seed=3).fit(df)
    p = m.predict_soft([0.1, 0.1])
    assert p.sum() == pytest.approx(1.0)
    assert len(p) == 3
    assert m.effective_num_clusters(df) >= 1.0


# ----------------------------------------------------------- Bisecting
def test_bisecting_recovers_blobs(spark, blobs3):
    df, pts = blobs3
    m = BisectingKMeans(k=3, max_iter=10, seed=5).fit(df)
    assert m.k == 3
    assert _recovers_blobs(m.centers)
    assert sum(m.summary.cluster_sizes) == len(pts)
    out = m.transform(df)
    assert out.select("prediction").distinct().count() == 3


def test_bisecting_min_divisible_limits_splits(spark, blobs3):
    df, pts = blobs3
    # every cluster below this size is not divisible → stops at k=1
    m = BisectingKMeans(k=5, min_divisible_cluster_size=10_000, seed=5).fit(df)
    assert m.k == 1


# -------------------------------------------------------------- XMeans
def test_xmeans_selects_three(spark, blobs3):
    df, _ = blobs3
    m = XMeans(min_k=2, max_k=6, max_iter=15, seed=7).fit(df)
    assert m.k == 3
    assert _recovers_blobs(m.centers)
    assert m.params["criterion"] == "bic"
    assert len(m.params["scores"]) >= 2


# ------------------------------------------------------------- DPMeans
def test_dpmeans_discovers_clusters(spark, blobs3):
    df, _ = blobs3
    # λ well below the inter-blob half-distance (SE div of 12 apart = 72/2)
    m = DPMeans(lam=10.0, max_iter=25, seed=9).fit(df)
    assert m.k == 3
    assert _recovers_blobs(m.centers)


def test_dpmeans_large_lambda_single_cluster(spark, blobs3):
    df, _ = blobs3
    m = DPMeans(lam=1e6, max_iter=10, seed=9).fit(df)
    assert m.k == 1


def test_xmeans_aic_criterion(spark, blobs3):
    df, _ = blobs3
    m = XMeans(min_k=2, max_k=5, criterion="aic", max_iter=10, seed=7).fit(df)
    assert m.params["criterion"] == "aic"
    assert m.k == 3
    import pytest as _pt
    with _pt.raises(ValueError):
        XMeans(criterion="bogus")
