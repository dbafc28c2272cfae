"""Tests for BregmanMixture, MiniBatchKMeans, CoresetKMeans, RobustKMeans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.mixture import BregmanMixture
from generalized_kmeans_clustering_spark.minibatch import MiniBatchKMeans
from generalized_kmeans_clustering_spark.coreset import CoresetKMeans
from generalized_kmeans_clustering_spark.robust import RobustKMeans


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(21)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.5, (120, 2)),
        rng.normal([10.0, 10.0], 0.5, (80, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


def _hits(centers, expected, tol=1.5):
    return all(
        np.min(np.linalg.norm(centers - e, axis=1)) < tol for e in expected
    )


def test_mixture_em_recovers_components(spark, blobs):
    df, pts = blobs
    m = BregmanMixture(k=2, max_iter=30, seed=13).fit(df)
    assert _hits(m.centers, [[0, 0], [10, 10]])
    # π matches 120:80 split
    assert sorted(np.round(m.weights, 1).tolist()) == [0.4, 0.6]
    # avg loglik from model matches training history tail
    assert m.avg_log_likelihood(df) == pytest.approx(m.log_likelihood, rel=1e-6)
    # loglik history (stored negated) must be non-increasing
    h = m.summary.distortion_history
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))
    out = m.transform(df)
    assert out.select("prediction").distinct().count() == 2
    psum = out.select(
        F.aggregate("probability", F.lit(0.0), lambda a, v: a + v).alias("s")
    ).agg(F.max(F.abs(F.col("s") - 1.0)).alias("err")).collect()[0]["err"]
    assert psum < 1e-9
    p = m.predict_soft([0.0, 0.0])
    assert p.sum() == pytest.approx(1.0)


def test_minibatch_recovers_blobs(spark, blobs):
    df, pts = blobs
    m = MiniBatchKMeans(k=2, batch_size=64, max_iter=40, seed=17).fit(df)
    assert _hits(m.centers, [[0, 0], [10, 10]], tol=2.0)
    assert len(m.summary.distortion_history) >= 5


def test_coreset_fit_and_weights(spark, blobs):
    df, pts = blobs
    est = CoresetKMeans(k=2, coreset_size=60, seed=19, max_iter=15)
    core = est.build_coreset(df)
    rows = core.select("_cs_weight").collect()
    assert 10 < len(rows) < len(pts)
    assert all(r["_cs_weight"] >= 1.0 for r in rows)
    m = est.fit(df)
    assert _hits(m.centers, [[0, 0], [10, 10]], tol=2.0)
    assert m.params["sensitivityStrategy"] == "hybrid"


def test_coreset_refinement(spark, blobs):
    df, _ = blobs
    m = CoresetKMeans(
        k=2, coreset_size=40, seed=19, enable_refinement=True,
        refinement_iterations=3,
    ).fit(df)
    assert _hits(m.centers, [[0, 0], [10, 10]], tol=1.0)


def test_robust_trim_ignores_outliers(spark):
    rng = np.random.default_rng(23)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (95, 2)),
        np.array([[500.0, 500.0], [-400.0, 300.0], [600.0, -500.0],
                  [300.0, 300.0], [-500.0, -500.0]]),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    m = RobustKMeans(
        k=1, outlier_mode="trim", outlier_fraction=0.06, max_iter=10, seed=23
    ).fit(df)
    # trimmed center sticks to the blob despite 5% extreme outliers
    assert np.linalg.norm(m.centers[0]) < 1.0
    out = m.transform(df)
    assert out.filter(F.col("is_outlier")).count() >= 5
    assert "outlier_score" in out.columns


def test_robust_mestimator_bounds_influence(spark):
    rng = np.random.default_rng(29)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (95, 2)),
        np.full((5, 2), 200.0),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    m = RobustKMeans(
        k=1, outlier_mode="mestimator", max_iter=15, seed=29
    ).fit(df)
    plain_mean = pts.mean(axis=0)  # dragged to ~[10,10]
    assert np.linalg.norm(m.centers[0]) < np.linalg.norm(plain_mean)


def test_coreset_sensitivity_strategies(spark, blobs):
    df, _ = blobs
    for strat in ("uniform", "distance", "density", "hybrid"):
        est = CoresetKMeans(
            k=2, coreset_size=60, sensitivity_strategy=strat, seed=19,
            max_iter=8,
        )
        m = est.fit(df)
        assert m.k == 2, strat
        assert m.params["sensitivityStrategy"] == strat
    with pytest.raises(ValueError):
        CoresetKMeans(sensitivity_strategy="nope")


def test_coreset_density_cost_parity(spark, blobs):
    """Density sensitivity must land within tolerance of hybrid on the
    full-data WCSS (same rough-center pass, different weighting)."""
    df, _ = blobs
    costs = {}
    for strat in ("density", "hybrid"):
        m = CoresetKMeans(
            k=2, coreset_size=80, sensitivity_strategy=strat, seed=7,
            max_iter=10,
        ).fit(df)
        costs[strat] = m.compute_cost(df)
    assert costs["density"] <= costs["hybrid"] * 1.5 + 1e-9
