"""Sparse KL/L1 paths: distance parity vs the dense kernels (same
smoothing convention), fits that never densify, and the zero-aware
exact L1 median update (reference
kernels/SparseBregmanKernel.scala:124-265)."""

import math
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generalized_kmeans_clustering_spark.functions.kernels import get_kernel
from generalized_kmeans_clustering_spark.operators.assignment import (
    distances_column,
)
from generalized_kmeans_clustering_spark.sparse import (
    SparseKMeans, densify, sparse_kl_distances, sparse_l1_distances,
)

DIM = 6
EPS = 1e-10


def coo_df(spark):
    rows = [
        ([0, 2], [3.0, 1.5]),
        ([1, 3, 5], [2.0, 0.5, 4.0]),
        ([0, 4], [1.0, 2.5]),
        ([2], [6.0]),
        ([1, 2, 4], [0.5, 1.0, 0.25]),
        ([3, 5], [2.0, 2.0]),
        ([0, 1], [4.0, 4.0]),
        ([4, 5], [3.0, 0.5]),
    ]
    return spark.createDataFrame(rows, "indices array<int>, values array<double>")


CENTERS = np.array([
    [1.0, 0.0, 2.0, 0.0, 1.0, 0.0],
    [0.0, 3.0, 0.0, 1.0, 0.0, 2.0],
])


@pytest.mark.parametrize("family", ["kl", "l1"])
def test_sparse_distance_matches_dense(spark, family):
    df = coo_df(spark)
    dense = densify(df, "indices", "values", DIM)
    if family == "kl":
        sp = sparse_kl_distances(F.col("indices"), F.col("values"), CENTERS, EPS)
        kern = get_kernel("kl", smoothing=EPS)
    else:
        sp = sparse_l1_distances(F.col("indices"), F.col("values"), CENTERS)
        kern = get_kernel("l1")
    dd = distances_column(kern, F.col("features"), CENTERS.tolist())
    rows = dense.withColumn("_sp", sp).withColumn("_dd", dd).collect()
    for r in rows:
        for a, b in zip(r["_sp"], r["_dd"]):
            assert a == pytest.approx(b, rel=1e-9, abs=1e-9), (r, a, b)


def test_sparse_kl_fit_does_not_densify(spark):
    df = coo_df(spark)
    m = SparseKMeans(k=2, dim=DIM, divergence="kl", sparse_mode="force",
                     max_iter=10, seed=1).fit(df)
    assert m.params["sparseMode"] == "sparse"
    assert m.kernel_name == "kl"
    # distortion non-increasing (exact Lloyd's property)
    h = m.summary.distortion_history
    assert all(h[i + 1] <= h[i] + 1e-9 for i in range(len(h) - 1))
    out = m.transform(df)
    assert out.where(F.col("prediction").isNull()).count() == 0
    # assignments must equal the dense-kernel argmin on the same centers
    dense = densify(df, "indices", "values", DIM)
    kern = get_kernel("kl", smoothing=EPS)
    dd = distances_column(kern, F.col("features"), m.centers.tolist())
    exp = [
        int(np.argmin(r["_dd"]))
        for r in dense.withColumn("_dd", dd).collect()
    ]
    got = [int(r["prediction"]) for r in out.collect()]
    assert got == exp


def test_sparse_kl_update_matches_dense_centroid(spark):
    """One KL iteration: centroid must equal inv_grad(mean grad) with
    zeros materialized (numpy oracle)."""
    df = coo_df(spark)
    m = SparseKMeans(k=2, dim=DIM, divergence="kl", sparse_mode="force",
                     max_iter=1, seed=1).fit(df)
    dense = np.array([
        r["features"] for r in
        densify(df, "indices", "values", DIM).collect()
    ])
    # recompute the iteration's assignment from the INITIAL centers:
    # reproduce init (hash-stable sample) indirectly by checking the
    # fitted centers are a valid KL centroid of SOME partition: weaker
    # but deterministic — each fitted center must be exp(mean(grad)-1)
    # of the rows assigned to it under the final assignment when
    # converged in 1 step is not guaranteed; instead verify the update
    # formula directly on the final model's own assignment.
    pred = np.array([int(r["prediction"]) for r in m.transform(df).collect()])
    for c in range(2):
        rows = dense[pred == c]
        if len(rows) == 0:
            continue
        grad = np.log(rows + EPS) + 1.0
        centroid = np.exp(grad.mean(axis=0) - 1.0)
        # the model converged → its centers are the centroid of its
        # own assignment
        if m.summary.converged:
            np.testing.assert_allclose(m.centers[c], centroid, rtol=1e-7)


def test_sparse_l1_fit_and_median_update(spark):
    df = coo_df(spark)
    m = SparseKMeans(k=2, dim=DIM, divergence="l1", sparse_mode="force",
                     max_iter=10, seed=3).fit(df)
    assert m.params["sparseMode"] == "sparse"
    assert m.kernel_name == "l1"
    out = m.transform(df)
    dense = np.array([
        r["features"] for r in
        densify(df, "indices", "values", DIM).collect()
    ])
    pred = np.array([int(r["prediction"]) for r in out.collect()])
    if m.summary.converged:
        for c in range(2):
            rows = dense[pred == c]
            if len(rows) == 0:
                continue
            # lower median: smallest v with cum-count >= n/2
            for i in range(DIM):
                vals = np.sort(rows[:, i])
                n = len(vals)
                idx = int(math.ceil(n / 2.0)) - 1
                assert m.centers[c, i] == pytest.approx(vals[idx]), (c, i)


def test_sparse_l1_zero_aware_median_manual(spark):
    """Hand-checked median with implicit zeros: one cluster, known cells."""
    rows = [
        ([0], [5.0]),
        ([0], [1.0]),
        ([], []),
        ([], []),
        ([], []),
    ]
    df = spark.createDataFrame(rows, "indices array<int>, values array<double>")
    m = SparseKMeans(k=1, dim=1, divergence="l1", sparse_mode="force",
                     max_iter=2, seed=0).fit(df)
    # values at dim 0: [5, 1, 0, 0, 0] → sorted [0,0,0,1,5], n=5,
    # lower median = 3rd smallest = 0
    assert m.centers[0, 0] == 0.0


def test_force_unsupported_divergence_raises(spark):
    with pytest.raises(ValueError):
        SparseKMeans(k=2, divergence="itakuraSaito", sparse_mode="force")


def test_auto_falls_back_dense_for_is(spark):
    df = coo_df(spark)
    m = SparseKMeans(k=2, dim=DIM, divergence="generalizedI",
                     sparse_mode="auto", max_iter=3, seed=2).fit(df)
    assert m.params.get("sparseMode") == "dense"
