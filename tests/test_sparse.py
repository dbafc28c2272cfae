"""Tests for SparseKMeans (COO sparse path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.sparse import SparseKMeans, densify


@pytest.fixture(scope="module")
def sparse_blobs(spark):
    """100-dim sparse rows: cluster A hot in dims 0-4, B hot in dims 50-54."""
    rng = np.random.default_rng(93)
    rows = []
    truth = []
    for _ in range(60):
        idx = sorted(rng.choice(5, 3, replace=False).tolist())
        rows.append(([int(i) for i in idx],
                     [float(5 + rng.normal(0, 0.2)) for _ in idx]))
        truth.append(0)
    for _ in range(60):
        idx = sorted((50 + rng.choice(5, 3, replace=False)).tolist())
        rows.append(([int(i) for i in idx],
                     [float(5 + rng.normal(0, 0.2)) for _ in idx]))
        truth.append(1)
    df = spark.createDataFrame(rows, "indices array<int>, values array<double>")
    return df.cache(), np.array(truth)


def test_sparse_kmeans_splits_blobs(spark, sparse_blobs):
    df, truth = sparse_blobs
    m = SparseKMeans(k=2, dim=100, max_iter=15, seed=95).fit(df)
    assert m.params["sparseMode"] == "sparse"
    assert m.params["density"] < 0.1
    out = m.transform(df).select("prediction").collect()
    pred = np.array([r["prediction"] for r in out])
    agree = max((pred == truth).mean(), (pred == 1 - truth).mean())
    assert agree > 0.95
    # centers live in the right dims
    C = m.centers
    hot0 = C[:, :5].sum(axis=1)
    hot50 = C[:, 50:55].sum(axis=1)
    assert (hot0.argmax() != hot50.argmax())


def test_sparse_transform_is_expression_only(spark, sparse_blobs):
    df, _ = sparse_blobs
    m = SparseKMeans(k=2, dim=100, max_iter=5, seed=95).fit(df)
    plan = m.transform(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


def test_sparse_dense_fallback(spark):
    rng = np.random.default_rng(97)
    # fully dense rows in 4 dims → auto picks dense engine
    rows = []
    for c in ([0.0] * 4, [10.0] * 4):
        for _ in range(30):
            rows.append((
                [0, 1, 2, 3],
                [float(x + rng.normal(0, 0.3)) for x in c],
            ))
    df = spark.createDataFrame(rows, "indices array<int>, values array<double>")
    m = SparseKMeans(k=2, dim=4, sparse_mode="auto", max_iter=10, seed=99).fit(df)
    assert m.params["sparseMode"] == "dense"
    assert m.k == 2


def test_sparse_force_rejects_unsupported():
    # KL/L1 now have real sparse paths; IS still has none
    with pytest.raises(ValueError):
        SparseKMeans(k=2, divergence="itakuraSaito", sparse_mode="force").fit(None)


def test_densify_scatter(spark):
    df = spark.createDataFrame(
        [([1, 3], [2.0, 4.0])], "indices array<int>, values array<double>"
    )
    out = densify(df, "indices", "values", 5).collect()[0]["features"]
    assert out == [0.0, 2.0, 0.0, 4.0, 0.0]
