"""Exact weighted median update + adaptive chunk sizing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import GeneralizedKMeans
from generalized_kmeans_clustering_spark.operators.assignment import (
    adaptive_chunk_size, auto_assigner, ChunkedExpressionAssignment,
)


def test_weighted_median_pulls_center(spark):
    # one cluster; values 0..4 with weight 1, value 100 with weight 10
    rows = [([float(v)], 1.0) for v in range(5)] + [([100.0], 10.0)]
    df = spark.createDataFrame(rows, "features array<double>, w double")
    m = GeneralizedKMeans(
        k=1, divergence="l1", weight_col="w", max_iter=3,
        init_mode="random", seed=1,
    ).fit(df)
    # total weight 15, half = 7.5 → cumulative reaches 7.5 only at 100
    assert m.centers[0][0] == pytest.approx(100.0)


def test_weighted_median_exact_lower_median(spark):
    rows = [([1.0], 1.0), ([2.0], 1.0), ([3.0], 1.0), ([4.0], 1.0)]
    df = spark.createDataFrame(rows, "features array<double>, w double")
    m = GeneralizedKMeans(
        k=1, divergence="l1", weight_col="w", max_iter=2,
        init_mode="random", seed=1,
    ).fit(df)
    # half-weight 2.0 reached at value 2 (lower weighted median)
    assert m.centers[0][0] == pytest.approx(2.0)


def test_unweighted_kmedians_still_works(spark):
    rng = np.random.default_rng(151)
    pts = np.concatenate([
        rng.normal([0, 0], 0.3, (40, 2)), rng.normal([8, 8], 0.3, (40, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    m = GeneralizedKMeans(k=2, divergence="l1", max_iter=10, seed=3).fit(df)
    C = np.sort(m.centers, axis=0)
    assert np.allclose(C[0], [0, 0], atol=0.5)
    assert np.allclose(C[1], [8, 8], atol=0.5)


def test_adaptive_chunk_size(spark):
    n = adaptive_chunk_size(spark, d=100)
    assert n >= 16
    a = auto_assigner(4, 10, "adaptive", spark=spark)
    assert isinstance(a, ChunkedExpressionAssignment)
    # adaptive strategy produces the same assignments as expression
    df = spark.createDataFrame(
        [([0.0, 0.0],), ([9.0, 9.0],)], "features array<double>"
    )
    m = GeneralizedKMeans(
        k=2, assignment_strategy="adaptive", max_iter=3,
        initial_centers=[[0.0, 0.0], [9.0, 9.0]],
    ).fit(df)
    out = m.transform(df).select("prediction").collect()
    assert [r["prediction"] for r in out] == [0, 1]
