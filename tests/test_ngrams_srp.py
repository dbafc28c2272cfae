"""Corpus top-k n-grams + embedding sign-random-projection SimHash."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.similarity import (
    embedding_simhash,
    embedding_simhash_near_dups,
    srp_signs,
)
from generalized_kmeans_clustering_spark.operators.text_features import (
    top_ngrams,
)


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the mat"),
        (2, "a cat and a dog"),
        (3, None),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_top_unigrams_counts_and_order(spark):
    out = top_ngrams(_docs(spark), n=1, k=3)
    rows = [(r["ngram"], r["n_docs"], r["n_occurrences"], r["rank"])
            for r in out.orderBy("rank").collect()]
    # 'the' x4 in 2 docs; 'a' x2, 'cat' x2, 'dog' x2, ... tie -> lexicographic
    assert rows[0] == ("the", 2, 4, 1)
    assert rows[1] == ("a", 1, 2, 2)
    assert rows[2][2] == 2


def test_top_bigrams_and_min_count(spark):
    out = top_ngrams(_docs(spark), n=2, k=5, min_count=2)
    rows = {r["ngram"]: (r["n_docs"], r["n_occurrences"])
            for r in out.collect()}
    assert rows["on the"] == (2, 2)
    assert rows["sat on"] == (2, 2)
    assert rows["the mat"] == (2, 2)
    assert all(c >= 2 for _, c in rows.values())
    assert "the cat" not in rows  # occurs once only


def test_top_ngrams_validates_args(spark):
    with pytest.raises(ValueError):
        top_ngrams(_docs(spark), n=0)
    with pytest.raises(ValueError):
        top_ngrams(_docs(spark), k=0)


def test_top_ngrams_null_and_empty_text_ignored(spark):
    out = top_ngrams(_docs(spark), n=1, k=100)
    assert out.where(F.col("ngram") == "").count() == 0


# ---- sign random projection ----

def _vecs(spark):
    import random

    rng = random.Random(3)
    base = [rng.gauss(0, 1) for _ in range(16)]
    rows = [
        (0, base),
        (1, [x + rng.gauss(0, 0.001) for x in base]),      # near-dup of 0
        (2, [-x for x in base]),                            # antipode of 0
    ] + [
        (10 + i, [rng.gauss(0, 1) for _ in range(16)])      # random others
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_signs_deterministic_rademacher():
    a = srp_signs(8, 4, seed=1)
    b = srp_signs(8, 4, seed=1)
    assert a == b
    assert all(v in (1.0, -1.0) for row in a for v in row)
    assert srp_signs(8, 4, seed=2) != a


def test_simhash_hamming_tracks_cosine(spark):
    df = _vecs(spark)
    sigs = {r["vec_id"]: r["simhash"]
            for r in embedding_simhash(df, num_bits=60).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[0], sigs[1]) <= 2        # near-identical
    assert ham(sigs[0], sigs[2]) == 60       # antipode flips every bit
    rand = [ham(sigs[0], sigs[10 + i]) for i in range(20)]
    assert 15 < sum(rand) / len(rand) < 45   # ~30 for random pairs
    # signatures are deterministic and positive BIGINTs
    again = {r["vec_id"]: r["simhash"]
             for r in embedding_simhash(df, num_bits=60).collect()}
    assert sigs == again
    assert all(s >= 0 for s in sigs.values())


def test_simhash_near_dups_blocked_join_finds_planted_pair(spark):
    df = _vecs(spark)
    pairs = {(r["i"], r["j"]): r["hamming"]
             for r in embedding_simhash_near_dups(df, max_hamming=3)
             .collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_simhash_plan_is_map_only(spark):
    df = _vecs(spark)
    out = embedding_simhash(df, num_bits=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_simhash_empty_input_raises(spark):
    df = _vecs(spark).where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        embedding_simhash(df)
