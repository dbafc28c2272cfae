"""External agreement metrics (agreement.py): hand-checked values,
degenerate conventions, and invariances."""

import math

import pytest

from generalized_kmeans_clustering_spark.agreement import (
    agreement_from_cells,
    agreement_metrics,
    contingency_table,
)


def test_perfect_match_all_ones():
    # identical partitions (relabeled): every metric = 1
    cells = [("a", 0, 10.0), ("b", 1, 5.0), ("c", 2, 7.0)]
    m = agreement_from_cells(cells)
    for k in ("ari", "rand", "fowlkes_mallows", "nmi", "homogeneity",
              "completeness", "v_measure", "purity"):
        assert m[k] == pytest.approx(1.0), k
    assert m["n"] == 22


def test_label_permutation_invariance():
    cells = [("a", 0, 10.0), ("a", 1, 2.0), ("b", 1, 8.0), ("b", 0, 3.0)]
    base = agreement_from_cells(cells)
    renamed = agreement_from_cells(
        [("x" + str(lab), 9 - prd, n) for lab, prd, n in cells]
    )
    for k in base:
        assert base[k] == pytest.approx(renamed[k]), k


def test_known_ari_sklearn_example():
    # sklearn docs example: labels_true=[0,0,1,1], labels_pred=[0,0,1,2]
    cells = [(0, 0, 2.0), (1, 1, 1.0), (1, 2, 1.0)]
    m = agreement_from_cells(cells)
    assert m["ari"] == pytest.approx(0.5714285714, abs=1e-9)
    # homogeneity 1 (each cluster pure), completeness < 1 (class 1 split)
    assert m["homogeneity"] == pytest.approx(1.0)
    assert m["completeness"] < 1.0
    assert m["purity"] == pytest.approx(1.0)


def test_single_cluster_degenerate():
    # one predicted cluster: completeness = 1 (vacuous), ARI = 0 against
    # a non-trivial truth, purity = majority share
    cells = [("a", 0, 6.0), ("b", 0, 4.0)]
    m = agreement_from_cells(cells)
    assert m["completeness"] == pytest.approx(1.0)
    assert m["homogeneity"] == pytest.approx(0.0)
    assert m["ari"] == pytest.approx(0.0)
    assert m["purity"] == pytest.approx(0.6)


def test_both_degenerate_identical():
    m = agreement_from_cells([("a", 0, 9.0)])
    assert m["ari"] == 1.0
    assert m["nmi"] == 1.0


def test_independent_partitions_near_zero_ari():
    # a fully independent (product) contingency: MI exactly 0 -> NMI /
    # V-measure 0; ARI is only ~0 (the chance correction is over random
    # permutations, not the product table, so finite n leaves a small
    # negative residual)
    cells = [
        (a, b, 25.0) for a in ("x", "y") for b in (0, 1)
    ]
    m = agreement_from_cells(cells)
    assert m["ari"] == pytest.approx(0.0, abs=0.02)
    assert m["nmi"] == pytest.approx(0.0, abs=1e-12)
    assert m["v_measure"] == pytest.approx(0.0, abs=1e-12)


def test_nmi_matches_direct_formula():
    cells = [(0, 0, 5.0), (0, 1, 1.0), (1, 1, 4.0), (2, 0, 2.0),
             (2, 2, 3.0)]
    m = agreement_from_cells(cells)
    n = sum(c[2] for c in cells)
    a = {}
    b = {}
    for lab, prd, cnt in cells:
        a[lab] = a.get(lab, 0) + cnt
        b[prd] = b.get(prd, 0) + cnt
    mi = sum(
        (c / n) * math.log(n * c / (a[la] * b[pr]))
        for la, pr, c in cells
    )
    ha = -sum((v / n) * math.log(v / n) for v in a.values())
    hb = -sum((v / n) * math.log(v / n) for v in b.values())
    assert m["nmi"] == pytest.approx(mi / math.sqrt(ha * hb))
    assert m["homogeneity"] == pytest.approx(mi / ha)
    assert m["completeness"] == pytest.approx(mi / hb)


def test_empty_raises():
    with pytest.raises(ValueError):
        agreement_from_cells([])


def test_dataframe_roundtrip(spark):
    rows = [(0, 0), (0, 0), (1, 1), (1, 2)]
    df = spark.createDataFrame(rows, "label int, pred int")
    ct = {(r["label"], r["pred"]): r["n"]
          for r in contingency_table(df, "label", "pred").collect()}
    assert ct == {(0, 0): 2, (1, 1): 1, (1, 2): 1}
    out = agreement_metrics(df, "label", "pred").collect()[0]
    assert out["n"] == 4
    assert out["ari"] == pytest.approx(0.5714285714, abs=1e-9)


def test_null_is_its_own_category(spark):
    df = spark.createDataFrame(
        [(0, 0), (None, 0), (None, 1)], "label int, pred int"
    )
    out = agreement_metrics(df, "label", "pred").collect()[0]
    assert out["n"] == 3  # NULL labels counted, not dropped


def test_clustering_stability_separated_blobs(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.agreement import (
        clustering_stability,
    )
    from generalized_kmeans_clustering_spark import GeneralizedKMeans

    rng = np.random.default_rng(2)
    centers = [[0.0, 0.0], [50.0, 0.0], [0.0, 50.0]]
    rows = [
        (i, [float(x) for x in centers[i % 3] + rng.normal(0, 0.5, 2)])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, features array<double>")
    stab = clustering_stability(
        df,
        lambda s: GeneralizedKMeans(k=3, divergence="se", max_iter=10,
                                    seed=s, init_mode="random"),
        seeds=[0, 1, 2],
        id_col="id",
    ).collect()
    assert len(stab) == 3  # C(3,2) pairs
    # well-separated blobs: every refit recovers the same partition
    from pyspark.sql import functions as F  # noqa: F401
    assert all(r["ari"] > 0.95 for r in stab)
    assert all(r["seed_a"] < r["seed_b"] for r in stab)


def test_clustering_stability_needs_two_seeds(spark):
    from generalized_kmeans_clustering_spark.agreement import (
        clustering_stability,
    )

    df = spark.createDataFrame([(0, [1.0])], "id long, features array<double>")
    with pytest.raises(ValueError):
        clustering_stability(df, lambda s: None, seeds=[0], id_col="id")
