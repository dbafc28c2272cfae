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
