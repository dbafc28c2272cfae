"""Standalone Lemma-1 pruned assignment (AcceleratedSEAssignment.scala:64-239)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import GeneralizedKMeans
from generalized_kmeans_clustering_spark.functions.kernels import get_kernel
from generalized_kmeans_clustering_spark.operators.assignment import (
    ExpressionAssignment, PrunedSEAssignment, pruning_stats,
)


@pytest.fixture(scope="module")
def df(spark):
    rng = np.random.default_rng(7)
    # 8 well-separated blobs -> pruning should actually fire
    centers = rng.uniform(-50, 50, size=(8, 4))
    pts = [
        (int(i), (centers[i % 8] + rng.normal(0, 0.5, 4)).tolist())
        for i in range(2000)
    ]
    return spark.createDataFrame(pts, "id long, features array<double>").cache()


CENTERS = [[-40.0, -40.0, 0.0, 0.0], [40.0, 40.0, 0.0, 0.0],
           [0.0, 0.0, -40.0, 40.0], [-40.0, 40.0, 0.0, 0.0],
           [40.0, -40.0, 0.0, 0.0], [0.0, 0.0, 40.0, -40.0],
           [20.0, 20.0, 20.0, 20.0], [-20.0, -20.0, -20.0, -20.0]]


def test_parity_with_exact(spark, df):
    se = get_kernel("se")
    exact = ExpressionAssignment().assign(df, se, CENTERS, "features") \
        .select("id", "_cluster", "_dist").orderBy("id").collect()
    pruned = PrunedSEAssignment().assign(df, se, CENTERS, "features") \
        .select("id", "_cluster", "_dist").orderBy("id").collect()
    assert [r["_cluster"] for r in exact] == [r["_cluster"] for r in pruned]
    for a, b in zip(exact, pruned):
        assert a["_dist"] == pytest.approx(b["_dist"], rel=1e-12)


def test_pruning_actually_prunes(spark, df):
    se = get_kernel("se")
    out = PrunedSEAssignment().assign(df, se, CENTERS, "features")
    stats = pruning_stats(out, k=len(CENTERS))
    assert stats["rows"] == 2000
    # well-separated blobs: far fewer than k distance evals per point
    assert stats["avg_computations"] < len(CENTERS)
    assert 0.0 < stats["pruning_rate"] < 1.0


def test_small_k_falls_back_to_exact(spark, df):
    se = get_kernel("se")
    out = PrunedSEAssignment().assign(df, se, CENTERS[:3], "features")
    rows = out.select("_ncomp").distinct().collect()
    assert [r["_ncomp"] for r in rows] == [3]  # every distance computed
    stats = pruning_stats(out, k=3)
    assert stats["pruning_rate"] == pytest.approx(0.0)


def test_rejects_non_decomposable_kernel(spark, df):
    with pytest.raises(ValueError, match="se_fast_path"):
        PrunedSEAssignment().assign(df, get_kernel("kl"), CENTERS, "features")


def test_fit_with_pruned_strategy_surfaces_rate(spark, df):
    model = GeneralizedKMeans(
        k=8, divergence="se", max_iter=4, seed=11,
        assignment_strategy="pruned", initial_centers=CENTERS,
    ).fit(df)
    s = model.summary
    assert len(s.pruned_history) == s.iterations
    assert 0.0 < s.pruning_rate < 1.0
    # distortion still non-increasing: pruning must not change the math
    h = s.distortion_history
    assert all(h[i + 1] <= h[i] * (1 + 1e-9) for i in range(len(h) - 1))
    # parity with the exact strategy on the same init
    exact = GeneralizedKMeans(
        k=8, divergence="se", max_iter=4, seed=11,
        initial_centers=CENTERS,
    ).fit(df)
    assert np.allclose(model.centers, exact.centers)
    # transform does not leak the telemetry column
    assert "_ncomp" not in model.transform(df).columns


def test_auto_rung_bounded_by_max_k(spark):
    """auto picks the pruned rung only inside [MIN_K, MAX_K]: beyond the
    cap the k×k driver matrix would dwarf the O(k·d) state the other
    rungs guarantee (r4 advice), so auto must fall through."""
    from generalized_kmeans_clustering_spark.functions.kernels import get_kernel
    from generalized_kmeans_clustering_spark.operators.assignment import (
        PRUNED_AUTO_MAX_K, PRUNED_AUTO_MIN_K, PrunedSEAssignment,
        auto_assigner,
    )

    se = get_kernel("squaredEuclidean")
    d = 4
    inside = auto_assigner(PRUNED_AUTO_MIN_K, d, "auto", kernel=se)
    assert isinstance(inside, PrunedSEAssignment)
    at_cap = auto_assigner(PRUNED_AUTO_MAX_K, d, "auto", kernel=se)
    assert isinstance(at_cap, PrunedSEAssignment)
    beyond = auto_assigner(PRUNED_AUTO_MAX_K + 1, d, "auto", kernel=se)
    assert not isinstance(beyond, PrunedSEAssignment)
    # explicit opt-in stays uncapped: the caller owns the k² tradeoff
    explicit = auto_assigner(PRUNED_AUTO_MAX_K + 1, d, "pruned", kernel=se)
    assert isinstance(explicit, PrunedSEAssignment)
