"""End-to-end GeneralizedKMeans tests, modeled on the reference's
LloydsIteratorSuite / PropertyBasedTestSuite / DeterminismSuite
(SURVEY.md §5.2-5.4).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import GeneralizedKMeans, GeneralizedKMeansModel


def blobs_df(spark, n=300, k=3, d=2, seed=0, shift=10.0, positive=False):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        c = i % k
        x = rng.randn(d) + shift * c
        if positive:
            x = np.abs(x) + 0.5
        rows.append((i, c, [float(v) for v in x]))
    return spark.createDataFrame(rows, "id long, label int, features array<double>")


def test_separated_blobs_converge(spark):
    df = blobs_df(spark, n=300, k=3)
    m = GeneralizedKMeans(k=3, seed=42, max_iter=20).fit(df)
    assert m.k == 3
    assert m.summary.converged
    # distortion non-increasing
    h = m.summary.distortion_history
    assert all(h[i + 1] <= h[i] + 1e-6 for i in range(len(h) - 1))
    # perfect separation → ARI would be 1; check purity via label majority
    pred = m.transform(df).select("label", "prediction").collect()
    from collections import Counter

    for lbl in range(3):
        preds = [r["prediction"] for r in pred if r["label"] == lbl]
        assert len(set(preds)) == 1


def test_predictions_complete_and_in_range(spark):
    df = blobs_df(spark, n=200, k=4)
    m = GeneralizedKMeans(k=4, seed=1).fit(df)
    out = m.transform(df)
    assert out.count() == 200
    rng_ok = out.agg(
        F.min("prediction").alias("lo"), F.max("prediction").alias("hi")
    ).collect()[0]
    assert rng_ok["lo"] >= 0 and rng_ok["hi"] < 4
    assert m.centers.shape == (4, 2)


def test_determinism_same_seed(spark):
    df = blobs_df(spark, n=200, k=3)
    m1 = GeneralizedKMeans(k=3, seed=7).fit(df)
    m2 = GeneralizedKMeans(k=3, seed=7).fit(df)
    np.testing.assert_array_equal(m1.centers, m2.centers)


def test_kl_divergence_fit(spark):
    df = blobs_df(spark, n=240, k=3, positive=True)
    m = GeneralizedKMeans(k=3, divergence="kl", seed=5, max_iter=15).fit(df)
    assert m.k == 3
    out = m.transform(df)
    assert out.count() == 240


def test_l1_kmedians_fit(spark):
    df = blobs_df(spark, n=240, k=3)
    m = GeneralizedKMeans(k=3, divergence="l1", seed=5, max_iter=10).fit(df)
    assert m.summary.iterations >= 1
    assert m.transform(df).count() == 240


def test_spherical_fit(spark):
    df = blobs_df(spark, n=240, k=3, positive=True)
    m = GeneralizedKMeans(k=3, divergence="spherical", seed=5).fit(df)
    # centers are unit-norm
    norms = np.linalg.norm(m.centers, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_weighted_fit(spark):
    df = blobs_df(spark, n=200, k=2).withColumn(
        "w", F.when(F.col("label") == 0, 10.0).otherwise(1.0)
    )
    m = GeneralizedKMeans(k=2, seed=3, weight_col="w").fit(df)
    assert m.k == 2


def test_fixed_initial_centers_deterministic_path(spark):
    df = blobs_df(spark, n=150, k=3)
    init = [[0.0, 0.0], [10.0, 10.0], [20.0, 20.0]]
    m = GeneralizedKMeans(k=3, initial_centers=init, max_iter=5, seed=0).fit(df)
    assert m.summary.converged


def test_compute_cost_and_predict(spark):
    df = blobs_df(spark, n=150, k=3)
    m = GeneralizedKMeans(k=3, seed=2).fit(df)
    cost = m.compute_cost(df)
    assert cost >= 0
    p = m.predict([0.0, 0.0])
    assert 0 <= p < 3


def test_distance_col(spark):
    df = blobs_df(spark, n=90, k=3)
    m = GeneralizedKMeans(k=3, seed=2, distance_col="dist").fit(df)
    out = m.transform(df)
    assert "dist" in out.columns
    assert out.where(F.col("dist") < 0).count() == 0


def test_k1_and_identical_points(spark):
    rows = [(i, [1.0, 2.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    m = GeneralizedKMeans(k=1, seed=0).fit(df)
    np.testing.assert_allclose(m.centers[0], [1.0, 2.0], atol=1e-9)


def test_empty_cluster_keep(spark):
    df = blobs_df(spark, n=60, k=2)
    # k=3 on 2 real blobs with far-off initial center → one empty cluster kept
    init = [[0.0, 0.0], [10.0, 10.0], [1e6, 1e6]]
    m = GeneralizedKMeans(k=3, initial_centers=init, max_iter=3,
                          empty_cluster_strategy="keep", seed=0).fit(df)
    assert m.k == 3


def test_empty_cluster_drop(spark):
    df = blobs_df(spark, n=60, k=2)
    init = [[0.0, 0.0], [10.0, 10.0], [1e6, 1e6]]
    m = GeneralizedKMeans(k=3, initial_centers=init, max_iter=3,
                          empty_cluster_strategy="drop", seed=0).fit(df)
    assert m.k == 2


def test_domain_validation_rejects(spark):
    rows = [(0, [0.5, -1.0]), (1, [0.2, 0.3])]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    with pytest.raises(ValueError, match="domain violation"):
        GeneralizedKMeans(k=2, divergence="itakuraSaito", seed=0).fit(df)


def test_vector_udt_accepted(spark):
    from pyspark.ml.linalg import Vectors

    rows = [(i, Vectors.dense([float(i % 2) * 10, 0.0])) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "features"])
    m = GeneralizedKMeans(k=2, seed=0).fit(df)
    assert m.k == 2


def test_persistence_roundtrip(spark, tmp_path):
    df = blobs_df(spark, n=120, k=3)
    m = GeneralizedKMeans(k=3, seed=9, distance_col="dist").fit(df)
    path = str(tmp_path / "model")
    m.save(spark, path)
    m2 = GeneralizedKMeansModel.load(spark, path)
    np.testing.assert_array_equal(m.centers, m2.centers)
    a = m.transform(df).select("id", "prediction").orderBy("id").collect()
    b = m2.transform(df).select("id", "prediction").orderBy("id").collect()
    assert a == b


def test_assignment_strategies_agree(spark):
    df = blobs_df(spark, n=200, k=3)
    init = [[1.0, 1.0], [9.0, 11.0], [21.0, 19.0]]
    preds = {}
    for strat in ["expression", "chunked", "pandas", "crossjoin"]:
        m = GeneralizedKMeans(k=3, initial_centers=init, max_iter=3,
                              assignment_strategy=strat, seed=0).fit(df)
        out = m.transform(df).select("id", "prediction").orderBy("id").collect()
        preds[strat] = [r["prediction"] for r in out]
        np.testing.assert_allclose(
            m.centers, preds.setdefault("_centers", m.centers), rtol=1e-9
        ) if isinstance(preds.get("_centers"), np.ndarray) else None
        preds["_centers"] = m.centers
    assert preds["expression"] == preds["chunked"] == preds["pandas"] == preds["crossjoin"]
