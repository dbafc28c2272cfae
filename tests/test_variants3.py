"""Tests for BalancedKMeans, ConstrainedKMeans, MultiViewKMeans."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.balanced import BalancedKMeans
from generalized_kmeans_clustering_spark.constrained import (
    ConstrainedKMeans, ConstraintSet,
)
from generalized_kmeans_clustering_spark.multiview import MultiViewKMeans, View


@pytest.fixture(scope="module")
def skewed(spark):
    """Two blobs with very uneven mass (160 vs 40)."""
    rng = np.random.default_rng(31)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 1.5, (160, 2)),
        rng.normal([8.0, 0.0], 0.5, (40, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


def test_balanced_soft_evens_sizes(spark, skewed):
    df, pts = skewed
    target = len(pts) / 2

    def dev(sizes):
        return sum(abs(s - target) for s in sizes)

    plain = BalancedKMeans(
        k=2, balance_penalty=0.0, max_iter=15, seed=33
    ).fit(df).summary.cluster_sizes
    bal = BalancedKMeans(
        k=2, balance_penalty=10.0, max_iter=15, seed=33
    ).fit(df).summary.cluster_sizes
    # plain k-means follows the 160/40 mass; the penalty pulls toward 100/100
    assert dev(bal) < dev(plain)
    assert sum(bal) == len(pts)


def test_balanced_hard_respects_capacity(spark, skewed):
    df, pts = skewed
    m = BalancedKMeans(
        k=4, balance_mode="hard", max_cluster_size=60, max_iter=5, seed=33
    ).fit(df)
    assert max(m.summary.cluster_sizes) <= 60
    assert sum(m.summary.cluster_sizes) == len(pts)


def test_constraint_set_union_find():
    cs = ConstraintSet(must_link=[(1, 2), (2, 3)], cannot_link=[(3, 9)])
    assert cs.find(1) == cs.find(3)
    assert cs.find(1) != cs.find(9)
    with pytest.raises(ValueError):
        ConstraintSet(must_link=[(1, 2)], cannot_link=[(1, 2)])


@pytest.fixture(scope="module")
def bridge(spark):
    """Two blobs plus 8 'bridge' points halfway between them."""
    rng = np.random.default_rng(37)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.4, (50, 2)),
        rng.normal([6.0, 0.0], 0.4, (50, 2)),
        rng.normal([3.0, 0.0], 0.1, (8, 2)),
    ])
    rows = [(int(i), [float(a), float(b)]) for i, (a, b) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    return df.cache(), pts


def test_constrained_soft_pulls_linked_points(spark, bridge):
    df, pts = bridge
    bridge_ids = list(range(100, 108))
    # must-link all bridge points to point 0 (left blob)
    ml = [(0, b) for b in bridge_ids]
    m = ConstrainedKMeans(
        k=2, must_link_pairs=ml, constraint_weight=50.0,
        max_iter=15, seed=39,
    ).fit(df)
    assert m.k == 2
    # with a strong pull the bridge points side with point 0's cluster
    out = m.transform(df).select("id", "prediction").collect()
    pred = {r["id"]: r["prediction"] for r in out}
    same = sum(1 for b in bridge_ids if pred[b] == pred[0])
    assert same >= 6


def test_constrained_hard_strict(spark, bridge):
    df, _ = bridge
    ml = [(0, 1), (1, 2)]
    cl = [(0, 99)]
    m = ConstrainedKMeans(
        k=2, must_link_pairs=ml, cannot_link_pairs=cl,
        constraint_mode="hard", max_iter=8, seed=39,
    ).fit(df)
    assert m.k == 2
    assert sum(m.summary.cluster_sizes) == 108


def test_multiview_joint_assignment(spark):
    rng = np.random.default_rng(41)
    # view1 separates clusters, view2 is noise — joint should still split
    pts1 = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (60, 2)),
        rng.normal([8.0, 0.0], 0.3, (60, 2)),
    ])
    pts2 = rng.normal(0.0, 1.0, (120, 3))
    rows = [
        ([float(x) for x in a], [float(x) for x in b])
        for a, b in zip(pts1, pts2)
    ]
    df = spark.createDataFrame(rows, "f1 array<double>, f2 array<double>")
    m = MultiViewKMeans(
        k=2,
        views=[View("f1", "squaredEuclidean", 0.9),
               View("f2", "squaredEuclidean", 0.1)],
        max_iter=15, seed=43,
    ).fit(df)
    assert m.k == 2
    # view-1 centers recover the blobs
    C = m.centers[0]
    assert any(abs(c[0]) < 1.0 for c in C)
    assert any(abs(c[0] - 8.0) < 1.0 for c in C)
    out = m.transform(df)
    assert out.select("prediction").distinct().count() == 2
    sizes = sorted(
        r["n"] for r in out.groupBy("prediction").agg(
            F.count(F.lit(1)).alias("n")).collect()
    )
    assert sizes == [60, 60]


def test_multiview_combine_strategies(spark):
    rng = np.random.default_rng(171)
    pts1 = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (30, 2)), rng.normal([8.0, 0.0], 0.3, (30, 2)),
    ])
    pts2 = np.concatenate([
        rng.normal([0.0, 5.0], 0.3, (30, 2)), rng.normal([0.0, -5.0], 0.3, (30, 2)),
    ])
    rows = [([float(x) for x in a], [float(x) for x in b])
            for a, b in zip(pts1, pts2)]
    df = spark.createDataFrame(rows, "f1 array<double>, f2 array<double>")
    views = [View("f1"), View("f2")]
    for strat in ("weighted_sum", "max", "min"):
        m = MultiViewKMeans(
            k=2, views=views, combine_strategy=strat, max_iter=8, seed=5,
        ).fit(df)
        out = m.transform(df)
        assert out.select("prediction").distinct().count() == 2, strat
    import pytest as _pt
    with _pt.raises(ValueError):
        MultiViewKMeans(k=2, views=views, combine_strategy="median")
