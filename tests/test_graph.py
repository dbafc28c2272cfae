"""Grid-bucketed epsilon-affinity graph (operators/graph.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.graph import (
    epsilon_affinity_edges,
)


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(3)
    X = rng.uniform(0, 10, size=(200, 3))
    return spark.createDataFrame(
        [(int(i), X[i].tolist()) for i in range(len(X))],
        "id long, features array<double>",
    ).cache(), X


def test_matches_brute_force(spark, pts):
    df, X = pts
    eps = 0.7
    out = {(r["i"], r["j"]): r["dist"]
           for r in epsilon_affinity_edges(df, dim=3, epsilon=eps).collect()}
    expect = {}
    for i in range(len(X)):
        for j in range(i + 1, len(X)):
            d = 0.5 * float(((X[i] - X[j]) ** 2).sum())
            if d <= eps:
                expect[(i, j)] = d
    assert set(out) == set(expect)
    for k, v in expect.items():
        assert out[k] == pytest.approx(v, rel=1e-12)


def test_rbf_weight_and_ordering(spark, pts):
    df, _ = pts
    rows = epsilon_affinity_edges(df, dim=3, epsilon=0.7, gamma=2.0).collect()
    assert all(r["i"] < r["j"] for r in rows)
    for r in rows:
        assert r["w"] == pytest.approx(np.exp(-2.0 * r["dist"]), rel=1e-12)


def test_no_duplicate_edges(spark, pts):
    df, _ = pts
    out = epsilon_affinity_edges(df, dim=3, epsilon=0.7)
    assert out.count() == out.select("i", "j").distinct().count()


def test_high_dim_rejected(spark, pts):
    df, _ = pts
    with pytest.raises(ValueError, match="3\\^9"):
        epsilon_affinity_edges(df, dim=9, epsilon=0.5)
