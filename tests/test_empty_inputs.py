"""Boundary behavior: every pipeline operator must survive empty
inputs (a 100 TB job's first/last partition-pruned slice is often
empty) without crashing or launching unbounded work."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_prepare_corpus_empty(spark, empty_docs):
    from generalized_kmeans_clustering_spark.operators.corpus import (
        corpus_stats, prepare_corpus,
    )

    out = prepare_corpus(empty_docs, min_tokens=5, dedup="exact")
    assert out.count() == 0
    assert corpus_stats(out).count() == 0
    out2 = prepare_corpus(empty_docs, dedup="minhash")
    assert out2.count() == 0


def test_duplicate_components_empty(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame([], "i long, j long")
    assert duplicate_components(pairs).count() == 0


def test_decontaminate_empty_sides(spark, empty_docs):
    from generalized_kmeans_clustering_spark.operators.decontamination import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [(1, "some perfectly ordinary text for the corpus side")],
        "doc_id long, text string")
    out = decontaminate(docs, empty_docs, method="ngram")
    rows = out.collect()
    assert len(rows) == 1 and not rows[0]["is_contaminated"]
    assert decontaminate(empty_docs, docs, method="exact").count() == 0


def test_session_rollup_empty(spark):
    from generalized_kmeans_clustering_spark.operators.rollup import (
        session_rollup,
    )

    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    assert session_rollup(ev).count() == 0


def test_jaccard_verify_empty_pairs(spark, empty_docs):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        jaccard_verify,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "i long, j long")
    assert jaccard_verify(docs, pairs).count() == 0


def test_streaming_near_dup_empty_batch(spark, tmp_path):
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    nd = StreamingNearDup(state_dir=str(tmp_path / "s"),
                          pairs_dir=str(tmp_path / "p"),
                          num_hashes=16, num_bands=4)
    empty = spark.createDataFrame([], "doc_id long, text string")
    nd.process_batch(empty, 0)
    assert nd.pairs(spark).count() == 0
