"""Accelerated (Elkan/Hamerly bounds) iterator: parity with exact Lloyd."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.kmeans import GeneralizedKMeans


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(121)
    pts = np.concatenate([
        rng.normal([0, 0], 0.5, (100, 2)),
        rng.normal([10, 0], 0.5, (100, 2)),
        rng.normal([0, 10], 0.5, (100, 2)),
        rng.normal([10, 10], 0.5, (100, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


INIT = [[1.0, 1.0], [9.0, 1.0], [1.0, 9.0], [9.0, 9.0]]


def test_elkan_matches_exact_lloyd(spark, blobs):
    df, _ = blobs
    exact = GeneralizedKMeans(
        k=4, max_iter=10, tol=0.0, seed=1, initial_centers=INIT,
        assignment_strategy="expression", empty_cluster_strategy="keep",
    ).fit(df)
    fast = GeneralizedKMeans(
        k=4, max_iter=10, tol=0.0, seed=1, initial_centers=INIT,
        assignment_strategy="elkan", empty_cluster_strategy="keep",
    ).fit(df)
    # same fixed init + same data → identical center trajectories
    assert np.allclose(exact.centers, fast.centers, atol=1e-9)
    assert exact.summary.cluster_sizes == fast.summary.cluster_sizes


def test_elkan_converges_and_costs_bound(spark, blobs):
    df, _ = blobs
    m = GeneralizedKMeans(
        k=4, max_iter=30, tol=1e-6, seed=3, assignment_strategy="elkan",
    ).fit(df)
    assert m.summary.converged
    exact_cost = m.compute_cost(df)
    # history entries are upper bounds on true cost at that iteration;
    # the final one must be >= the exact final cost
    assert m.summary.distortion_history[-1] >= exact_cost * (1 - 1e-9)


def test_elkan_transform_and_k1_fallback(spark, blobs):
    df, _ = blobs
    m1 = GeneralizedKMeans(
        k=1, max_iter=3, assignment_strategy="elkan", seed=5
    ).fit(df)
    assert m1.k == 1
    m = GeneralizedKMeans(
        k=4, max_iter=5, assignment_strategy="elkan", seed=5
    ).fit(df)
    out = m.transform(df)
    assert out.select("prediction").distinct().count() == 4


def test_elkan_rejects_non_se(spark, blobs):
    df, _ = blobs
    with pytest.raises(ValueError):
        GeneralizedKMeans(
            k=2, divergence="kl", assignment_strategy="elkan"
        ).fit(df)
