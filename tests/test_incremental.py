"""Incremental dedup (operators/incremental.py): verdict semantics,
the store-update loop invariant, and delta-vs-store LSH candidates."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from generalized_kmeans_clustering_spark.operators.incremental import (
    fingerprint_store,
    incremental_exact_dedup,
    incremental_lsh_pairs,
    updated_fingerprint_store,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (0, "alpha beta gamma"),
        (1, "delta epsilon zeta"),
        (2, "alpha beta gamma"),   # dup of 0 inside snapshot
        (10, "alpha beta gamma"),  # delta dup of store
        (11, "eta theta iota"),    # fresh
        (12, "eta theta iota"),    # within-delta dup of 11
        (13, "kappa lambda mu"),   # fresh
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_store_is_distinct_min_id(corpus):
    store = fingerprint_store(corpus.where(F.col("doc_id") < 10))
    got = {r["keep_id"] for r in store.collect()}
    assert got == {0, 1}
    assert store.count() == 2


def test_verdicts(corpus):
    store = fingerprint_store(corpus.where(F.col("doc_id") < 10))
    delta = corpus.where(F.col("doc_id") >= 10)
    v = {r["id"]: r for r in
         incremental_exact_dedup(delta, store).collect()}
    assert set(v) == {10, 11, 12, 13}
    assert v[10]["in_store"] and v[10]["dup_of"] == 0
    assert not v[10]["is_canonical"]
    assert v[11]["is_canonical"] and v[11]["dup_of"] is None
    assert not v[12]["is_canonical"] and v[12]["dup_of"] == 11
    assert v[13]["is_canonical"] and v[13]["dup_of"] is None


def test_store_update_loop_invariant(corpus):
    # store after N deltas == fingerprint_store of all accepted docs
    store = fingerprint_store(corpus.where(F.col("doc_id") < 10))
    delta = corpus.where(F.col("doc_id") >= 10)
    v = incremental_exact_dedup(delta, store)
    new_store = updated_fingerprint_store(store, v)
    accepted = corpus.where(F.col("doc_id") < 10).select("doc_id", "text") \
        .unionByName(
            delta.join(v.where("is_canonical").select(F.col("id")
                       .alias("doc_id")), on="doc_id"))
    direct = fingerprint_store(
        accepted.join(
            fingerprint_store(accepted).select(F.col("keep_id")
                                               .alias("doc_id")),
            on="doc_id"))
    got = sorted((r["fingerprint"], r["keep_id"]) for r in new_store.collect())
    want = sorted((r["fingerprint"], r["keep_id"]) for r in direct.collect())
    assert got == want


def test_empty_delta(corpus, spark):
    store = fingerprint_store(corpus)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert incremental_exact_dedup(empty, store).count() == 0


def test_empty_store(corpus, spark):
    empty_store = fingerprint_store(
        spark.createDataFrame([], "doc_id long, text string"))
    v = {r["id"]: r for r in
         incremental_exact_dedup(corpus, empty_store).collect()}
    # pure within-batch dedup when nothing is stored yet
    assert v[0]["is_canonical"] and not v[2]["is_canonical"]
    assert v[2]["dup_of"] == 0 and not v[2]["in_store"]


def test_incremental_lsh_matches_self_join_cross_pairs(corpus):
    # delta-vs-store candidates == the (delta, store) pairs of the
    # full self-join on the union frame
    sigs = minhash_signatures(corpus, num_hashes=16, shingle_n=2)
    store_ids = {0, 1, 2}
    store_sigs = sigs.where(F.col("doc_id").isin(list(store_ids)))
    delta_sigs = sigs.where(~F.col("doc_id").isin(list(store_ids)))
    inc = {(r["i"], r["j"]) for r in incremental_lsh_pairs(
        delta_sigs, store_sigs, num_bands=4).collect()}
    full = {(r["i"], r["j"]) for r in lsh_candidate_pairs(
        sigs, num_bands=4).collect()}
    want = {(max(i, j), min(i, j)) for i, j in full
            if (i in store_ids) != (j in store_ids)}
    got = {(i, j) for i, j in inc}
    assert got == want
    # no store-store pair ever appears
    assert all(i not in store_ids for i, _ in inc)


def test_incremental_lsh_include_delta_pairs(corpus):
    sigs = minhash_signatures(corpus, num_hashes=16, shingle_n=2)
    store_sigs = sigs.where(F.col("doc_id") <= 2)
    delta_sigs = sigs.where(F.col("doc_id") > 2)
    both = incremental_lsh_pairs(
        delta_sigs, store_sigs, num_bands=4, include_delta_pairs=True
    ).collect()
    # 11 and 12 are identical -> their delta-internal pair must appear
    assert (11, 12) in {(r["i"], r["j"]) for r in both}
