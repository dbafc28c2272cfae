"""PMI collocations (text_features.top_collocations) and cross-source
content overlap (corpus.source_overlap)."""

import math

import pytest

from generalized_kmeans_clustering_spark.operators.corpus import (
    source_overlap,
)
from generalized_kmeans_clustering_spark.operators.text_features import (
    top_collocations,
)


def test_pmi_hand_computed(spark):
    # "a b" appears 2x; unigrams: a:2 b:2 c:2; bigrams: ab,ab,bc,ca -> 4
    df = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b c")], "doc_id long, text string"
    )
    rows = top_collocations(df, k=10, min_count=2).collect()
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert set(got) == {("a", "b"), ("b", "c")}
    # tokens: a:2 b:3 c:2, t1=7; pairs: ab,bc,ca,ab,bc -> t2=5
    want_ab = math.log((2 / 5) / ((2 / 7) * (3 / 7)))
    assert got[("a", "b")]["n_pair"] == 2
    assert got[("a", "b")]["pmi"] == pytest.approx(want_ab)
    # ranks ordered by pmi desc
    pmis = [r["pmi"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert pmis == sorted(pmis, reverse=True)


def test_min_count_suppresses_hapax_pairs(spark):
    df = spark.createDataFrame(
        [(0, "p q p q r s")], "doc_id long, text string"
    )
    rows = top_collocations(df, k=10, min_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("p", "q")}


def test_collocations_cache_count_frames_two_corpus_passes(spark):
    """r12 optimization pin: the unigram and bigram count frames are
    persisted, so all five consumers (two unigram joins, the min_count
    survivor filter, both totals — the bigram total is the integer sum
    of the cached unfiltered counts) read the two caches and one
    action tokenizes the corpus exactly TWICE, not five times."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    df = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b c")], "doc_id long, text string"
    )
    pins = Pins()
    out = top_collocations(df, k=10, min_count=2, pins=pins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 5, plan
    assert len(pins) == 2
    got = {(r["w1"], r["w2"]): r["n_pair"] for r in out.collect()}
    assert got == {("a", "b"): 2, ("b", "c"): 2}
    pins.release()


def test_collocations_validation(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        top_collocations(df, k=0)
    with pytest.raises(ValueError):
        top_collocations(df, min_count=0)


def test_source_overlap_matrix(spark):
    df = spark.createDataFrame(
        [
            (0, "shared one", "s1"),
            (1, "shared one", "s2"),     # content in s1 & s2
            (2, "shared one", "s2"),     # within-source copy: collapses
            (3, "only s1", "s1"),
            (4, "shared two", "s1"),
            (5, "shared two", "s3"),
            (6, "only s3", "s3"),
            (7, None, "s1"),             # NULL text drops out
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r["source_a"], r["source_b"]): r
            for r in source_overlap(df).collect()}
    assert set(rows) == {("s1", "s2"), ("s1", "s3")}
    r12 = rows[("s1", "s2")]
    assert r12["n_shared"] == 1
    # s1 distinct content = {shared one, only s1, shared two} -> 3
    assert r12["share_of_a"] == pytest.approx(1 / 3)
    # s2 distinct = {shared one} -> fully contained
    assert r12["share_of_b"] == pytest.approx(1.0)
    r13 = rows[("s1", "s3")]
    assert r13["n_shared"] == 1
    assert r13["share_of_b"] == pytest.approx(1 / 2)


def test_source_overlap_caches_fingerprints_once(spark):
    """r12 optimization pin: the distinct (fingerprint, source) frame
    feeds four branches (both self-join sides + the two per-source
    broadcast builds) — persisted, one action fingerprints the corpus
    exactly once; the Pins handle tracks it plus the per-source
    counts."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    df = spark.createDataFrame(
        [(0, "shared one", "s1"), (1, "shared one", "s2")],
        "doc_id long, text string, source string",
    )
    pins = Pins()
    out = source_overlap(df, pins=pins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert len(pins) == 2
    assert [(r["source_a"], r["source_b"], r["n_shared"])
            for r in out.collect()] == [("s1", "s2", 1)]
    pins.release()


def test_source_overlap_disjoint_sources_empty(spark):
    df = spark.createDataFrame(
        [(0, "x", "a"), (1, "y", "b")],
        "doc_id long, text string, source string",
    )
    assert source_overlap(df).count() == 0
