"""Tests for evaluation metrics (SURVEY.md §2.9) against numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.kmeans import GeneralizedKMeans
from generalized_kmeans_clustering_spark.evaluation import evaluate, ClusteringEvaluator


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(7)
    pts = np.concatenate([
        rng.normal([0.0, 0.0], 0.3, (60, 2)),
        rng.normal([10.0, 0.0], 0.3, (50, 2)),
        rng.normal([0.0, 10.0], 0.3, (40, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache(), pts


def _np_metrics(pts, centers, labels):
    k = len(centers)
    sizes = np.bincount(labels, minlength=k)
    d2 = 0.5 * ((pts[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    own = d2[np.arange(len(pts)), labels]
    wcss = own.sum()
    overall = pts.mean(axis=0)
    bcss = sum(
        sizes[c] * 0.5 * ((centers[c] - overall) ** 2).sum()
        for c in range(k) if sizes[c] > 0
    )
    return wcss, bcss, sizes


def test_metrics_match_numpy(spark, blobs):
    df, pts = blobs
    model = GeneralizedKMeans(k=3, divergence="se", max_iter=20, seed=1).fit(df)
    res = evaluate(model, df, silhouette_sample=1.0)

    C = model.centers
    D = 0.5 * ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    labels = D.argmin(axis=1)
    wcss, bcss, sizes = _np_metrics(pts, C, labels)

    assert res["n"] == len(pts)
    assert res["wcss"] == pytest.approx(wcss, rel=1e-9)
    assert res["bcss"] == pytest.approx(bcss, rel=1e-9)
    assert sorted(res["cluster_sizes"]) == sorted(sizes.tolist())

    k_eff = res["k_effective"]
    ch = (bcss / (k_eff - 1)) / (wcss / (len(pts) - k_eff))
    assert res["calinski_harabasz"] == pytest.approx(ch, rel=1e-9)

    # well-separated blobs: sanity ranges
    assert res["silhouette"] > 0.8
    assert res["davies_bouldin"] < 0.5
    assert res["dunn"] > 1.0


def test_silhouette_full_sample_matches_numpy(spark, blobs):
    df, pts = blobs
    model = GeneralizedKMeans(k=3, divergence="se", max_iter=20, seed=1).fit(df)
    res = evaluate(model, df, silhouette_sample=1.0)
    C = model.centers
    D = 0.5 * ((pts[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    labels = D.argmin(axis=1)
    a = D[np.arange(len(pts)), labels]
    Dmask = D.copy()
    Dmask[np.arange(len(pts)), labels] = np.inf
    b = Dmask.min(axis=1)
    sil = np.mean((b - a) / np.maximum(a, b))
    assert res["silhouette"] == pytest.approx(sil, rel=1e-9)


def test_evaluator_facade(spark, blobs):
    df, _ = blobs
    model = GeneralizedKMeans(k=3, divergence="se", max_iter=20, seed=1).fit(df)
    ev = ClusteringEvaluator(metric="wcss")
    assert ev.evaluate_model(model, df) == pytest.approx(
        evaluate(model, df)["wcss"], rel=1e-9
    )


def test_single_cluster_degenerate(spark, blobs):
    df, _ = blobs
    model = GeneralizedKMeans(k=1, divergence="se", max_iter=5, seed=1).fit(df)
    res = evaluate(model, df)
    assert res["k_effective"] == 1
    assert np.isnan(res["calinski_harabasz"])
    assert np.isnan(res["silhouette"])
    assert res["wcss"] > 0


def test_evaluate_with_label_col(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark import GeneralizedKMeans
    from generalized_kmeans_clustering_spark.evaluation import evaluate

    rng = np.random.default_rng(4)
    centers = [[0.0, 0.0], [40.0, 0.0]]
    rows = [
        (i, i % 2, [float(x) for x in centers[i % 2] + rng.normal(0, 0.5, 2)])
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "id long, truth int, features array<double>")
    model = GeneralizedKMeans(k=2, divergence="se", max_iter=10,
                              seed=1).fit(df)
    res = evaluate(model, df, label_col="truth")
    # separated blobs: external metrics agree perfectly with the truth
    assert res["ari"] == 1.0
    assert res["purity"] == 1.0
    assert res["v_measure"] == 1.0
    # internal metrics still present
    assert res["wcss"] > 0 and res["k_effective"] == 2
