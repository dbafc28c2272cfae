"""Benchmark decontamination (operators/decontamination.py)."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.decontamination import (
    decontaminate, ngram_collisions,
)

LEAK = ("the capital of france is paris and the capital of spain is "
        "madrid while the capital of italy is rome exactly")


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "completely original text about distributed query engines "
             "and their shuffle behavior at large scale today"),
         (2, f"some padding before the leak {LEAK} and padding after"),
         (3, LEAK),
         (4, "short unrelated")],
        "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(
        [(100, LEAK),
         (101, "what is the boiling point of water at sea level in "
               "degrees celsius under standard pressure conditions")],
        "doc_id long, text string")


def test_exact_method_flags_identical_docs(spark, corpus, bench_df):
    out = {r["doc_id"]: r["is_contaminated"] for r in decontaminate(
        corpus, bench_df, method="exact").collect()}
    assert out == {1: False, 2: False, 3: True, 4: False}


def test_ngram_method_catches_embedded_leak(spark, corpus, bench_df):
    out = {r["doc_id"]: r for r in decontaminate(
        corpus, bench_df, method="ngram", n=13).collect()}
    assert out[3]["is_contaminated"]          # identical
    assert out[2]["is_contaminated"]          # leak inside padding
    assert not out[1]["is_contaminated"]
    assert not out[4]["is_contaminated"]
    assert out[2]["n_collisions"] >= 1
    assert out[3]["n_collisions"] >= out[2]["n_collisions"] - 2


def test_min_collisions_threshold(spark, corpus, bench_df):
    # a very high threshold clears the padded doc but not the identical
    hi = {r["doc_id"]: r["is_contaminated"] for r in decontaminate(
        corpus, bench_df, method="ngram", n=3,
        min_collisions=10_000).collect()}
    assert not any(hi.values())


def test_drop_mode_removes_contaminated(spark, corpus, bench_df):
    kept = decontaminate(corpus, bench_df, method="ngram", mode="drop")
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 4]
    assert "is_contaminated" not in kept.columns


def test_ngram_collisions_counts_distinct(spark):
    # repeated gram in the corpus doc counts once (distinct grams)
    c = spark.createDataFrame(
        [(1, "a b c d e a b c d e a b c d e")], "doc_id long, text string")
    b = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    row = ngram_collisions(c, b, n=5).collect()
    assert [(r["doc_id"], r["n_collisions"]) for r in row] == [(1, 1)]


def test_invalid_args(spark, corpus, bench_df):
    with pytest.raises(ValueError):
        decontaminate(corpus, bench_df, method="bogus")
    with pytest.raises(ValueError):
        decontaminate(corpus, bench_df, mode="bogus")
