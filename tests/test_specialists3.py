"""Tests for sequence kernels, TimeSeriesKMeans, InformationBottleneck,
CoClustering."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions.sequence import (
    dtw, soft_dtw, gak_distance, derivative_dtw, dba_barycenter,
)
from generalized_kmeans_clustering_spark.timeseries import TimeSeriesKMeans
from generalized_kmeans_clustering_spark.info_bottleneck import InformationBottleneck
from generalized_kmeans_clustering_spark.coclustering import CoClustering


def test_sequence_distances_basic():
    a = np.array([0.0, 1.0, 2.0, 3.0])
    assert dtw(a, a) == pytest.approx(0.0)
    # time-shifted copy: DTW ~0, euclidean would be large
    b = np.array([0.0, 0.0, 1.0, 2.0, 3.0])
    assert dtw(a, b) < 0.01
    c = np.array([5.0, 6.0, 7.0, 8.0])
    assert dtw(a, c) > 1.0
    assert soft_dtw(a, c, gamma=0.1) > soft_dtw(a, b, gamma=0.1)
    assert gak_distance(a, a) == pytest.approx(0.0, abs=1e-9)
    assert gak_distance(a, c) > gak_distance(a, b)
    # DDTW ignores constant offsets (same shape)
    d = a + 100.0
    assert derivative_dtw(a, d) == pytest.approx(0.0, abs=1e-9)


def test_dba_barycenter_averages():
    series = [np.array([0.0, 1.0, 2.0]), np.array([2.0, 3.0, 4.0])]
    bc = dba_barycenter(series, iters=10)
    assert bc == pytest.approx(np.array([1.0, 2.0, 3.0]), abs=0.5)


def test_timeseries_kmeans_clusters_shapes(spark):
    rng = np.random.default_rng(81)
    t = np.linspace(0, 2 * np.pi, 24)
    sines = [np.sin(t + rng.uniform(0, 0.5)) + rng.normal(0, 0.05, 24)
             for _ in range(15)]
    ramps = [np.linspace(0, 1, 24) + rng.normal(0, 0.05, 24)
             for _ in range(15)]
    rows = [([float(x) for x in s],) for s in sines + ramps]
    df = spark.createDataFrame(rows, "features array<double>")
    m = TimeSeriesKMeans(k=2, kernel_type="dtw", max_iter=8, seed=83).fit(df)
    lbl = m.training_labels
    assert (lbl[:15] == lbl[0]).all()
    assert (lbl[15:] == lbl[15]).all()
    assert lbl[0] != lbl[15]
    out = m.transform(df).select("prediction").collect()
    pred = np.array([r["prediction"] for r in out])
    assert (pred == lbl).mean() > 0.9
    assert m.predict(sines[0]) == lbl[0]


def test_information_bottleneck_compresses(spark):
    rng = np.random.default_rng(85)
    # X perfectly predicts Y: two feature groups, two labels
    rows = []
    for _ in range(300):
        if rng.random() < 0.5:
            rows.append(([float(rng.integers(0, 3)), 0.0], 0))
        else:
            rows.append(([float(rng.integers(10, 13)), 1.0], 1))
    df = spark.createDataFrame(rows, "features array<double>, label int")
    m = InformationBottleneck(
        k=2, beta=10.0, num_bins=64, max_iter=50, seed=87
    ).fit(df)
    # T should retain almost all information about Y
    assert m.i_ty > 0.5  # ln2 ≈ 0.69 is the max here
    out = m.transform(df)
    # clusters align with labels up to permutation
    agree = out.groupBy("label", "prediction").count().collect()
    best = {}
    for r in agree:
        best[(r["label"], r["prediction"])] = r["count"]
    n_match = max(
        best.get((0, 0), 0) + best.get((1, 1), 0),
        best.get((0, 1), 0) + best.get((1, 0), 0),
    )
    assert n_match / 300 > 0.95


def test_coclustering_block_structure(spark):
    rng = np.random.default_rng(89)
    # 2×2 block matrix: means 0, 5, 5, 0
    triples = []
    for i in range(20):
        for j in range(20):
            base = 5.0 if (i < 10) != (j < 10) else 0.0
            triples.append((i, j, base + float(rng.normal(0, 0.1))))
    df = spark.createDataFrame(triples, "row_index long, col_index long, value double")
    m = CoClustering(
        num_row_clusters=2, num_col_clusters=2, max_iter=8, seed=91
    ).fit(df)
    # rows 0-9 together, 10-19 together (same for cols)
    ra = m.row_assign
    assert len({ra[i] for i in range(10)}) == 1
    assert len({ra[i] for i in range(10, 20)}) == 1
    assert ra[0] != ra[10]
    ca = m.col_assign
    assert len({ca[j] for j in range(10)}) == 1
    assert ca[0] != ca[10]
    # block means recover {0, 5}
    B = np.sort(m.block_means.ravel())
    assert B[:2] == pytest.approx([0.0, 0.0], abs=0.1)
    assert B[2:] == pytest.approx([5.0, 5.0], abs=0.1)
    # residual cost is tiny relative to signal
    assert m.residual_cost(df) / len(triples) < 0.05
