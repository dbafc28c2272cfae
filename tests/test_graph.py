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


# --- same_key_pairs: skew-guarded same-fingerprint edge build (r13) ---

from generalized_kmeans_clustering_spark.operators.graph import (  # noqa: E402
    same_key_pairs,
)
from generalized_kmeans_clustering_spark.operators.pins import (  # noqa: E402
    Pins,
)


@pytest.fixture(scope="module")
def keyed_rows(spark):
    # one HOT key (60 ids > cap=8), several small groups, singletons,
    # and NULL keys (which must produce NO edges — self-join parity)
    rows = [("hot", i) for i in range(60)]
    rows += [("a", 100), ("a", 101), ("a", 102)]
    rows += [("b", 200), ("b", 201)]
    rows += [("solo", 300)]
    rows += [(None, 400), (None, 401), (None, 402)]
    return spark.createDataFrame(rows, "k string, id long").cache()


def _reference_pairs(spark, df):
    a = df.where(F.col("k").isNotNull()).alias("a")
    b = df.where(F.col("k").isNotNull()).alias("b")
    return {
        (r["src"], r["dst"])
        for r in a.join(b, (F.col("a.k") == F.col("b.k"))
                        & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .collect()
    }


def test_same_key_pairs_hot_group_matches_self_join(spark, keyed_rows):
    expect = _reference_pairs(spark, keyed_rows)
    pins = Pins()
    try:
        rows = same_key_pairs(keyed_rows, "k", "id", group_cap=8,
                              salt=4, pins=pins).collect()
    finally:
        pins.release()
    got = [(r["src"], r["dst"]) for r in rows]
    assert len(got) == len(set(got)), "duplicate edges from salt blocks"
    assert set(got) == expect           # 60*59/2 hot + 3 + 1 edges
    assert len(expect) == 60 * 59 // 2 + 3 + 1


def test_same_key_pairs_all_small_is_exact(spark, keyed_rows):
    # cap above every group size: pure collect_list path, same set
    expect = _reference_pairs(spark, keyed_rows)
    got = {(r["src"], r["dst"])
           for r in same_key_pairs(keyed_rows, "k", "id",
                                   group_cap=4096).collect()}
    assert got == expect


def test_same_key_pairs_salt_one_still_exact(spark, keyed_rows):
    expect = _reference_pairs(spark, keyed_rows)
    got = [(r["src"], r["dst"])
           for r in same_key_pairs(keyed_rows, "k", "id", group_cap=8,
                                   salt=1).collect()]
    assert len(got) == len(set(got))
    assert set(got) == expect


def test_same_key_pairs_rejects_bad_params(spark, keyed_rows):
    with pytest.raises(ValueError):
        same_key_pairs(keyed_rows, "k", "id", group_cap=1)
    with pytest.raises(ValueError):
        same_key_pairs(keyed_rows, "k", "id", salt=0)
