"""Tests for the LLM-data-pipeline operators (dedup, similarity, text)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.dedup import (
    exact_dedup, exact_dup_groups, minhash_signatures, lsh_candidate_pairs,
    jaccard_verify, simhash64, simhash_near_dups,
)
from generalized_kmeans_clustering_spark.operators.similarity import (
    cosine_topk, ivf_index, ivf_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base.replace("today", "yesterday")),     # near dup of 0
        (3, "completely different text about spark sql engines and shuffles"),
        (4, "another unrelated document mentioning clustering algorithms"),
        (5, base),                                   # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3
    assert groups[0]["keep_id"] == 0
    kept = exact_dedup(docs)
    assert kept.count() == 4  # 6 docs − 2 dropped dups
    assert {r["doc_id"] for r in kept.select("doc_id").collect()} == {0, 2, 3, 4}


def test_minhash_lsh_finds_near_dups(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=32, shingle_n=3)
    assert sigs.count() == 6
    pairs = lsh_candidate_pairs(sigs, num_bands=8)
    got = {(r["i"], r["j"]) for r in pairs.collect()}
    # exact dups always collide; near-dup (0,2) should too at 8 bands
    assert (0, 1) in got and (0, 5) in got and (1, 5) in got
    assert (0, 2) in got
    verified = jaccard_verify(docs, pairs, threshold=0.5)
    v = {(r["i"], r["j"]): r["jaccard"] for r in verified.collect()}
    assert v[(0, 1)] == 1.0
    assert 0.5 <= v[(0, 2)] < 1.0
    # unrelated docs must not be verified as dups
    assert (0, 3) not in v and (3, 4) not in v


def test_simhash(spark, docs):
    sigs = simhash64(docs)
    m = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert m[0] == m[1] == m[5]
    assert m[0] != m[3]
    # near-dup has small hamming distance to the original
    ham = bin((m[0] ^ m[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 12
    near = simhash_near_dups(sigs, max_hamming=3)
    got = {(r["i"], r["j"]) for r in near.collect()}
    assert (0, 1) in got and (0, 5) in got


def test_simhash_near_dups_caches_signatures_once(spark, docs):
    """r12 optimization pin: the quartered signature frame is
    persisted before the 4-branch pigeonhole self-join, so all 8 join
    inputs read ONE InMemoryRelation instead of re-deriving the
    signature lineage per input (for text SimHash that was 8 corpus
    scans + shingle-hash-vote evaluations per action). The optional
    Pins handle tracks exactly that one frame."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    pins = Pins()
    near = simhash_near_dups(simhash64(docs), max_hamming=3, pins=pins)
    plan = near._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 8, plan
    assert len(pins) == 1
    got = {(r["i"], r["j"]) for r in near.collect()}
    assert (0, 1) in got and (0, 5) in got
    pins.release()


def test_minhash_md5_hash_fn_same_collisions(spark, docs):
    """The cross-engine md5 hash mode must find the same exact-dup
    collisions (identical texts → identical signatures regardless of
    the underlying hash)."""
    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=3,
                              hash_fn="md5")
    pairs = lsh_candidate_pairs(sigs, num_bands=4, num_hashes=16,
                                bucket_mode="raw")
    got = {(r["i"], r["j"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 5) in got and (1, 5) in got
    with pytest.raises(ValueError):
        minhash_signatures(docs, hash_fn="crc32")


def test_lsh_empty_signatures_frame(spark):
    """Empty input must produce an empty pairs frame, not a TypeError
    from a None first() probe."""
    empty = spark.createDataFrame([], "doc_id long, signature array<bigint>")
    out = lsh_candidate_pairs(empty, num_bands=4)
    assert out.count() == 0
    assert set(out.columns) == {"i", "j"}


def test_cosine_topk_exact(spark):
    rng = np.random.RandomState(0)
    V = rng.randn(50, 16)
    rows = [(i, [float(x) for x in V[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(df, df.where(F.col("vec_id") < 3), k=5)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    # numpy oracle
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    for q in range(3):
        order = [i for i in np.argsort(-S[q]) if i != q][:5]
        for rank, nid in enumerate(order, start=1):
            assert got[(q, rank)] == nid, (q, rank)


def test_ivf_recall(spark):
    rng = np.random.RandomState(1)
    # clustered vectors so IVF probing works well
    centers = rng.randn(5, 16) * 5
    V = np.vstack([centers[i % 5] + rng.randn(16) * 0.3 for i in range(200)])
    rows = [(i, [float(x) for x in V[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, model = ivf_index(df, n_lists=5, max_iter=5)
    queries = df.where(F.col("vec_id") < 5)
    exact = cosine_topk(df, queries, k=5)
    approx = ivf_topk(indexed, model, queries, k=5, nprobe=2)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, recall


def test_topk_where_prefilter_keeps_k(spark):
    """A 50%-selective predicate must still yield k rows per query
    (pre-filter before the rank window), and every neighbor must
    satisfy it — post-filtering the unfiltered top-k would under-fill."""
    rng = np.random.RandomState(7)
    V = rng.randn(200, 16)
    rows = [(i, [float(x) for x in V[i]]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 3)
    k = 5
    # brute baseline
    out = cosine_topk(df, queries, k=k, where="vec_id % 2 = 0").collect()
    per_q = {}
    for r in out:
        assert r["neighbor_id"] % 2 == 0
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert all(len(v) == k for v in per_q.values()) and len(per_q) == 3
    # equals brute top-k over the pre-filtered corpus
    ref = cosine_topk(df.where(F.col("vec_id") % 2 == 0), queries,
                      k=k).collect()
    assert {(r["query_id"], r["rank"], r["neighbor_id"]) for r in out} == \
           {(r["query_id"], r["rank"], r["neighbor_id"]) for r in ref}
    # IVF path: same guarantees within probed lists
    indexed, model = ivf_index(df, n_lists=4, max_iter=5)
    ivf = ivf_topk(indexed, model, queries, k=k, nprobe=4,
                   where=F.col("vec_id") % 2 == 0).collect()
    per_q = {}
    for r in ivf:
        assert r["neighbor_id"] % 2 == 0
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    # nprobe=4 of 4 lists probes everything -> must match the brute ref
    assert all(len(v) == k for v in per_q.values())
    assert {(r["query_id"], r["rank"], r["neighbor_id"]) for r in ivf} == \
           {(r["query_id"], r["rank"], r["neighbor_id"]) for r in ref}


def test_quantized_topk_where_prefilter(spark):
    """pq/sq/ivf_pq/ivf_sq top-k: the where pre-filter restricts
    candidates and k survives a 50% filter."""
    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_pq_index, ivf_pq_topk, ivf_sq_index, ivf_sq_topk, pq_encode,
        pq_topk, sq_encode, sq_topk, train_pq, train_sq,
    )

    rng = np.random.RandomState(11)
    V = rng.randn(120, 8)
    rows = [(i, [float(x) for x in V[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 2)
    k = 4

    pq = train_pq(df, m=2, k_sub=8, seed=3)
    out = pq_topk(pq_encode(df, pq), pq, queries, k=k, n_queries=2,
                  where="vec_id % 2 = 0").collect()
    assert len(out) == 2 * k and all(r["neighbor_id"] % 2 == 0 for r in out)

    sq = train_sq(df)
    out = sq_topk(sq_encode(df, sq), sq, queries, k=k, n_queries=2,
                  where="vec_id % 2 = 0").collect()
    assert len(out) == 2 * k and all(r["neighbor_id"] % 2 == 0 for r in out)

    enc, coarse, pqm = ivf_pq_index(df, n_lists=2, m=2, k_sub=8, seed=5)
    out = ivf_pq_topk(enc, coarse, pqm, queries, k=k, nprobe=2,
                      where="vec_id % 2 = 0").collect()
    assert len(out) == 2 * k and all(r["neighbor_id"] % 2 == 0 for r in out)

    enc, coarse, sqm = ivf_sq_index(df, n_lists=2, seed=5)
    out = ivf_sq_topk(enc, coarse, sqm, queries, k=k, nprobe=2,
                      where="vec_id % 2 = 0").collect()
    assert len(out) == 2 * k and all(r["neighbor_id"] % 2 == 0 for r in out)


def test_ivf_index_metadata_passthrough_and_reserved_guard(spark):
    """indexed carries corpus metadata (so where= predicates reach the
    stored index's scan) but NOT the redundant original vector column;
    reserved working names raise instead of colliding."""
    rows = [(i, [float(i), 1.0], f"s{i % 2}") for i in range(20)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, src string")
    indexed, _ = ivf_index(df, n_lists=2, max_iter=1)
    assert set(indexed.columns) == {"vec_id", "src", "_v", "_list"}
    for bad in ("_v", "_list", "query_id"):
        with pytest.raises(ValueError, match="reserved"):
            ivf_index(df.withColumn(bad, F.lit(1)), n_lists=2)


def test_knn_graph_where_filters_both_sides(spark):
    """knn_graph(where=...): the graph is built over the predicate's
    rows — every edge endpoint satisfies it, directed mode still
    yields k neighbors per surviving node (degree guarantee), and the
    result equals the graph over the pre-filtered frame when the
    index is probe-complete."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        knn_graph,
    )

    rng = np.random.RandomState(5)
    V = rng.randn(80, 8)
    rows = [(i, [float(x) for x in V[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    init = [[float(x) for x in V[i]] for i in range(4)]
    kw = dict(k=3, n_lists=4, nprobe=4, max_iter=0, initial_centers=init)
    out = knn_graph(df, mode="directed",
                    where=F.col("vec_id") % 2 == 0, **kw).collect()
    per_q = {}
    for r in out:
        assert r["query_id"] % 2 == 0 and r["neighbor_id"] % 2 == 0
        per_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert len(per_q) == 40 and all(len(v) == 3 for v in per_q.values())
    # nprobe == n_lists -> equals the graph over the pre-filtered frame
    ref = knn_graph(df.where(F.col("vec_id") % 2 == 0), mode="directed",
                    **kw).collect()
    assert {(r["query_id"], r["rank"], r["neighbor_id"]) for r in out} == \
           {(r["query_id"], r["rank"], r["neighbor_id"]) for r in ref}
    # union mode composes the same filter
    und = knn_graph(df, mode="union",
                    where=F.col("vec_id") % 2 == 0, **kw).collect()
    assert und and all(r["i"] % 2 == 0 and r["j"] % 2 == 0 for r in und)


def test_near_dups_ivf_where_prefilters_before_bucketing(spark):
    """embedding_near_dups_ivf(where=...): pairs only among predicate
    rows, equal to running the operator on the pre-filtered frame
    (the filter sits before indexing/bucketing)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        embedding_near_dups_ivf,
    )

    rng = np.random.RandomState(8)
    base = rng.randn(30, 8)
    # near-dup pairs: each row i and its +60 twin (tiny perturbation)
    V = np.vstack([base, base + rng.randn(30, 8) * 1e-3])
    rows = [(i, [float(x) for x in V[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_dups_ivf(df, threshold=0.99, n_lists=2, seed=1,
                                  where="vec_id % 3 != 0").collect()
    assert got and all(r["i"] % 3 != 0 and r["j"] % 3 != 0 for r in got)
    ref = embedding_near_dups_ivf(df.where("vec_id % 3 != 0"),
                                  threshold=0.99, n_lists=2,
                                  seed=1).collect()
    assert {(r["i"], r["j"]) for r in got} == \
           {(r["i"], r["j"]) for r in ref}


def test_knn_graph_where_reaches_candidate_scan(spark, tmp_path):
    """The knn_graph predicate must land in the candidate FileScan's
    DataFilters (the r8 ivf_topk assert, lifted to the graph layer)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        knn_graph,
    )

    rng = np.random.RandomState(4)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    store = str(tmp_path / "knnsrc")
    spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .write.parquet(store)
    df = spark.read.parquet(store)
    init = [rows[i][1] for i in range(3)]
    out = knn_graph(df, k=3, n_lists=3, nprobe=3, max_iter=0,
                    initial_centers=init, mode="directed",
                    where="vec_id % 2 = 0")
    plan = out._jdf.queryExecution().toString()
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert scans and any("% 2" in l for l in scans), scans


def test_ann_recall_counts_overlap_per_query(spark):
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ann_recall,
    )

    exact = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 12), (1, 20), (1, 21), (1, 22),
         (2, 30), (2, 31), (2, 32)],
        "query_id long, neighbor_id long")
    approx = spark.createDataFrame(
        [(0, 10), (0, 11), (0, 99),   # 2/3
         (1, 20), (1, 21), (1, 22)],  # 3/3; query 2 missing -> 0
        "query_id long, neighbor_id long")
    out = {r["query_id"]: r["recall"]
           for r in ann_recall(approx, exact, k=3).collect()}
    assert out == {0: pytest.approx(2 / 3), 1: pytest.approx(1.0), 2: 0.0}
    with pytest.raises(ValueError):
        ann_recall(approx, exact, k=0)


def test_topk_where_filter_reaches_candidate_scan(spark, tmp_path):
    """The where predicate must land in the candidate FileScan's
    DataFilters (pre-join pushdown) — at scale it prunes files/row
    groups instead of discarding ranked rows after the window."""
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, model = ivf_index(df, n_lists=4, max_iter=2)
    store = str(tmp_path / "ivfidx")
    indexed.write.parquet(store)
    out = ivf_topk(spark.read.parquet(store), model,
                   df.where(F.col("vec_id") < 2), k=3, nprobe=4,
                   where="vec_id % 2 = 0")
    plan = out._jdf.queryExecution().toString()
    # the written store is the plan's only FileScan; the predicate must
    # appear in its DataFilters (long paths can truncate the line, so
    # match the filter rather than the path)
    scan = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan and any("% 2" in l for l in scan), scan


def test_exact_rerank_sqeuclidean_recovers_ground_truth(spark):
    """Refine contract: reranking ALL ids as candidates equals the
    brute-force exact top-k (numpy oracle); reranking a PQ ADC
    candidate superset (k'=20) loses nothing vs exact top-3 that the
    superset contains — and never does worse than raw ADC top-3."""
    from generalized_kmeans_clustering_spark.operators.quantization import (
        pq_encode, pq_topk, train_pq,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        exact_rerank,
    )

    rng = np.random.RandomState(3)
    V = rng.randn(120, 16)
    rows = [(i, [float(x) for x in V[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 4)
    # all-pairs candidates -> rerank == exact top-k
    all_cand = df.selectExpr("vec_id AS neighbor_id").crossJoin(
        queries.selectExpr("vec_id AS query_id")
    ).where("neighbor_id <> query_id")
    got = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["exact_dist"])
           for r in exact_rerank(all_cand, df, queries, k=5).collect()}
    for q in range(4):
        d = ((V - V[q]) ** 2).sum(axis=1)
        order = [i for i in np.argsort(d, kind="stable") if i != q][:5]
        for rank, nid in enumerate(order, start=1):
            assert got[(q, rank)][0] == nid, (q, rank)
            assert abs(got[(q, rank)][1] - d[nid]) < 1e-9
    # PQ recall-then-refine: rerank of the ADC top-20 vs raw ADC top-3
    model = train_pq(df, m=4, k_sub=16, seed=0, max_iter=3)
    enc = pq_encode(df, model)
    adc3 = pq_topk(enc, model, queries, k=3)
    cand20 = pq_topk(enc, model, queries, k=20)
    refined = exact_rerank(cand20, df, queries, k=3)
    exact_top3 = {
        q: {i for i in np.argsort(((V - V[q]) ** 2).sum(axis=1),
                                  kind="stable") if i != q}
        for q in range(4)}
    def recall(frame):
        hits = tot = 0
        for r in frame.collect():
            q = r["query_id"]
            top = sorted(exact_top3[q],
                         key=lambda i: ((V[i] - V[q]) ** 2).sum())[:3]
            hits += r["neighbor_id"] in top
            tot += 1
        return hits / tot
    assert recall(refined) >= recall(adc3)


def test_exact_rerank_cosine_matches_cosine_topk(spark):
    """metric='cosine' restricted to cosine_topk's own rows must
    reproduce cosine_topk exactly (same sim values, same order)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        exact_rerank,
    )

    rng = np.random.RandomState(5)
    V = rng.randn(60, 8)
    rows = [(i, [float(x) for x in V[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 3)
    base = cosine_topk(df, queries, k=4)
    rr = exact_rerank(base, df, queries, k=4, metric="cosine")
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["sim"], 9))
         for r in base.collect()}
    g = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["sim"], 9))
         for r in rr.collect()}
    assert b == g
    with pytest.raises(ValueError, match="metric"):
        exact_rerank(base, df, queries, metric="dot")


def test_ivf_topk_probe_selection_is_shuffle_free(spark):
    """r12 optimization pin: probe selection (top-nprobe centroid sims
    per query) is a map-only array_sort/slice — the sole Window in the
    ivf_topk plan is the final per-query top-k rank, even when the
    query side is a big un-broadcast table (the knn_graph self-probe,
    where the old posexplode+Window shape shuffled the whole query
    side before the _list join)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index, ivf_topk,
    )

    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, model = ivf_index(df, n_lists=4, seed=1, max_iter=2)
    plan = ivf_topk(indexed, model, df, k=3, nprobe=2,
                    broadcast_queries=False)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Window [") == 1, plan


def test_exact_rerank_plan_broadcasts_candidates(spark):
    """The corpus side must not shuffle: candidates and queries ride
    broadcast joins; the only exchange is the tiny re-rank window."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        exact_rerank,
    )

    rng = np.random.RandomState(6)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 2)
    cand = cosine_topk(df, queries, k=5)
    plan = exact_rerank(cand, df, queries, k=3)._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("formatted"))
    assert plan.count("BroadcastExchange") >= 2
    # corpus scan feeds broadcast joins; the sole hash exchange is the
    # candidate-row window partitioning
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
