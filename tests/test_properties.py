"""Property-based tests (hypothesis) mirroring the reference's
``ml/PropertyBasedTestSuite.scala:94-381``: ∀ (n, d, k):
#predictions = n, assignments ∈ [0,k), cost ≥ 0, k centers of dim d,
``predict`` agrees with ``transform``, weights shift centers.
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import GeneralizedKMeans

SETTINGS = dict(max_examples=8, deadline=None, derandomize=True)


def _df(spark, X):
    return spark.createDataFrame(
        [([float(v) for v in row],) for row in X], "features array<double>"
    )


@given(
    n=st.integers(8, 60),
    d=st.integers(1, 6),
    k=st.integers(1, 5),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_fit_transform_invariants(spark_global, n, d, k, seed):
    spark = spark_global
    k = min(k, n)
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 5, (n, d))
    df = _df(spark, X)
    model = GeneralizedKMeans(
        k=k, seed=seed, max_iter=4, init_mode="random"
    ).fit(df)
    # k centers of dim d
    assert model.centers.shape == (model.k, d)
    assert model.k <= k
    out = model.transform(df).select("prediction").collect()
    preds = [r["prediction"] for r in out]
    # every row predicted, all labels in range
    assert len(preds) == n
    assert all(0 <= p < model.k for p in preds)
    # cost is non-negative
    assert model.compute_cost(df) >= 0.0
    # driver predict agrees with distributed transform
    for row, p in zip(X[:10], preds[:10]):
        assert model.predict(row) == p


@given(seed=st.integers(0, 10_000))
@settings(**SETTINGS)
def test_kl_on_simplex(spark_global, seed):
    """KL divergence clustering on probability-simplex rows stays in
    domain and produces valid simplex-ish centers."""
    spark = spark_global
    rng = np.random.default_rng(seed)
    X = rng.dirichlet([1.0, 1.0, 1.0], size=40)
    df = _df(spark, X)
    model = GeneralizedKMeans(
        k=2, divergence="kl", seed=seed, max_iter=4, init_mode="random"
    ).fit(df)
    assert (model.centers > 0).all()
    assert model.compute_cost(df) >= 0.0


def test_weight_sensitivity(spark):
    """Up-weighting a point pulls its cluster center toward it."""
    rows = [
        ([0.0, 0.0], 1.0), ([1.0, 0.0], 1.0), ([0.0, 1.0], 1.0),
        ([10.0, 10.0], 1.0),
    ]
    df = spark.createDataFrame(rows, "features array<double>, w double")
    m_plain = GeneralizedKMeans(
        k=1, weight_col="w", max_iter=3, init_mode="random", seed=1
    ).fit(df)
    rows_heavy = [(f, (100.0 if f == [10.0, 10.0] else w)) for f, w in rows]
    df_heavy = spark.createDataFrame(
        rows_heavy, "features array<double>, w double"
    )
    m_heavy = GeneralizedKMeans(
        k=1, weight_col="w", max_iter=3, init_mode="random", seed=1
    ).fit(df_heavy)
    d_plain = np.linalg.norm(m_plain.centers[0] - [10, 10])
    d_heavy = np.linalg.norm(m_heavy.centers[0] - [10, 10])
    assert d_heavy < d_plain


@given(
    n=st.integers(10, 80),
    d=st.integers(1, 5),
    k=st.integers(5, 12),
    seed=st.integers(0, 10_000),
)
@settings(**SETTINGS)
def test_pruned_assignment_parity(spark_global, n, d, k, seed):
    """∀ (n, d, k, data): Lemma-1 pruning never changes an assignment
    or a distance vs the exact expression path."""
    from generalized_kmeans_clustering_spark.functions.kernels import (
        get_kernel,
    )
    from generalized_kmeans_clustering_spark.operators.assignment import (
        ExpressionAssignment, PrunedSEAssignment,
    )

    spark = spark_global
    rng = np.random.default_rng(seed)
    X = rng.normal(0, 5, (n, d))
    C = rng.normal(0, 5, (k, d)).tolist()
    df = _df(spark, X)
    se = get_kernel("se")
    both = PrunedSEAssignment(min_k=2).assign(
        df, se, C, "features", cluster_col="_cp", dist_col="_dp"
    )
    both = ExpressionAssignment().assign(
        both, se, C, "features", cluster_col="_ce", dist_col="_de"
    )
    rows = both.select("_cp", "_ce", "_dp", "_de", "_ncomp").collect()
    assert all(r["_cp"] == r["_ce"] for r in rows)
    assert all(abs(r["_dp"] - r["_de"]) < 1e-9 for r in rows)
    # computation counts are within [1, k]
    assert all(1 <= r["_ncomp"] <= k for r in rows)


@settings(**SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda p: p[0] != p[1]),
    min_size=1, max_size=40,
))
def test_duplicate_components_match_union_find(spark_global, edges):
    """Distributed min-label propagation == driver union-find on any
    random edge list (components labeled by their minimum id)."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in parent:
        roots.setdefault(find(n), []).append(n)
    expect = {}
    for members in roots.values():
        lo = min(members)
        for n in members:
            expect[n] = lo

    pairs = spark_global.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "i long, j long")
    got = {r["id"]: r["component"]
           for r in duplicate_components(pairs, max_iter=40).collect()}
    assert got == expect
    star = {r["id"]: r["component"]
            for r in duplicate_components(pairs, method="star").collect()}
    assert star == expect


@settings(**SETTINGS)
@given(st.lists(st.integers(1, 700), min_size=1, max_size=40),
       st.integers(0, 3))
def test_pack_concat_matches_python_reference(spark_global, sizes, seed):
    """pack_concat's distributed span math == a straight python walk
    over the same hash-ordered token stream (exact pack ids, offsets
    and lengths, not just invariants)."""
    from generalized_kmeans_clustering_spark.operators.packing import (
        pack_concat,
    )

    L = 256
    docs = spark_global.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)],
        "doc_id long, n_tokens long")
    spans = pack_concat(docs, L, num_shards=2, seed=seed)
    got = sorted(tuple(r) for r in spans.collect())

    # python reference: same xxhash64 order, same per-shard stream walk
    from pyspark.sql import functions as F

    keyed = docs.select(
        "doc_id", "n_tokens",
        F.xxhash64(F.concat_ws("|", F.col("doc_id").cast("string"),
                               F.lit(str(seed)))).alias("k"),
    ).collect()
    expect = []
    for shard in (0, 1):
        stream = sorted(((r["k"], r["doc_id"], r["n_tokens"])
                         for r in keyed if r["k"] % 2 == shard),
                        key=lambda t: (t[0], t[1]))
        cum = 0
        for _, did, n in stream:
            prev, cum = cum, cum + n
            for p in range(prev // L, (cum - 1) // L + 1):
                expect.append((did, shard,
                               p,
                               max(prev - p * L, 0),
                               max(p * L - prev, 0),
                               min((p + 1) * L, cum) - max(p * L, prev)))
    assert got == sorted(expect)
