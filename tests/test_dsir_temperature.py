"""DSIR importance weighting + temperature mixture sampling."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.dsir import (
    dsir_bucket_model,
    dsir_ngram_buckets,
    dsir_select,
    dsir_weights,
)
from generalized_kmeans_clustering_spark.operators.sampling import (
    temperature_budgets,
    temperature_sample,
)


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the dog sat on the log", "en"),
        (2, "le chat est noir", "fr"),
        (3, "le chien est blanc", "fr"),
        (4, "der hund ist gross", "de"),
        (5, None, "en"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---- feature extraction ----

def test_ngram_buckets_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    out = df.select(
        F.size(dsir_ngram_buckets(F.col("text"), 16)).alias("n")).first()
    # 3 unigrams + 2 bigrams
    assert out["n"] == 5


def test_ngram_buckets_null_and_empty_text(spark):
    df = spark.createDataFrame([(None,), ("",), ("  ",)], "text string")
    ns = [r["n"] for r in df.select(
        F.size(dsir_ngram_buckets(F.col("text"), 16)).alias("n")).collect()]
    assert ns == [0, 0, 0]


def test_ngram_buckets_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("the cat sat",)], "text string")
    a = df.select(dsir_ngram_buckets(F.col("text"), 32).alias("b")).first()["b"]
    b = df.select(dsir_ngram_buckets(F.col("text"), 32).alias("b")).first()["b"]
    assert a == b
    assert all(0 <= x < 32 for x in a)


# ---- bucket model ----

def test_bucket_model_full_domain_and_smoothing(spark):
    B = 64
    model = dsir_bucket_model(_docs(spark), n_buckets=B)
    rows = model.collect()
    assert len(rows) == B
    # probabilities (with smoothing) sum to 1 over the full domain
    total = sum(math.exp(r["log_p"]) for r in rows)
    assert math.isclose(total, 1.0, rel_tol=1e-9)
    # absent buckets share the smoothed floor log(1/(N+B))
    floor = min(r["log_p"] for r in rows)
    n_grams = 11 + 11 + 7 + 7 + 7  # per-doc unigrams+bigrams (docs 0-4)
    assert math.isclose(floor, math.log(1.0 / (n_grams + B)), rel_tol=1e-9)


# ---- weights ----

def test_dsir_weights_favor_target_like_docs(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    out = dsir_weights(docs, target, n_buckets=256)
    w = {r["doc_id"]: r["log_weight"] for r in out.collect()}
    assert len(w) == 7
    # English docs look more like the English target than French/German
    assert min(w[0], w[1]) > max(w[2], w[3], w[4])
    # doc with no grams keeps weight exactly 0
    assert w[5] == 0.0 and w[6] == 0.0


def test_dsir_weights_identical_corpora_are_zero(spark):
    docs = _docs(spark).where(F.col("text").isNotNull())
    out = dsir_weights(docs, docs, n_buckets=128)
    for r in out.collect():
        assert abs(r["log_weight"]) < 1e-12


def test_dsir_select_gumbel_topm_deterministic(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    w = dsir_weights(docs, target, n_buckets=256)
    a = [r["doc_id"] for r in dsir_select(w, 3, seed=1).collect()]
    b = [r["doc_id"] for r in dsir_select(w, 3, seed=1).collect()]
    assert a == b and len(a) == 3
    with pytest.raises(ValueError):
        dsir_select(w, 0)


def test_dsir_plan_is_python_free_and_broadcasts_ratio(spark):
    docs = _docs(spark)
    target = docs.where(F.col("lang") == "en")
    out = dsir_weights(docs, target, n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


# ---- temperature sampling ----

def test_temperature_budgets_alpha1_proportional():
    b = temperature_budgets({"en": 800, "fr": 200}, 1.0, 100)
    assert math.isclose(b["en"], 80.0) and math.isclose(b["fr"], 20.0)


def test_temperature_budgets_alpha0_uniform():
    b = temperature_budgets({"en": 800, "fr": 200}, 0.0, 100)
    assert math.isclose(b["en"], 50.0) and math.isclose(b["fr"], 50.0)


def test_temperature_budgets_upweights_low_resource():
    b = temperature_budgets({"en": 10_000, "sw": 100}, 0.5, 1000)
    # alpha<1 gives the small stratum a larger share than proportional
    assert b["sw"] / 1000 > 100 / 10_100
    assert math.isclose(sum(b.values()), 1000)
    # zero/None totals drop out cleanly
    assert temperature_budgets({"a": 0, "b": None}, 0.5, 10) == {"a": 0, "b": 0}
    with pytest.raises(ValueError):
        temperature_budgets({"a": 1}, -0.1, 10)


def test_temperature_sample_respects_budgets(spark):
    import random

    rng = random.Random(0)
    rows = [(i, "en" if i < 900 else "fr", rng.randint(50, 150))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    tot = {r["lang"]: r["t"] for r in
           df.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    out = temperature_sample(df, alpha=0.3, total_budget=40_000)
    got = {r["lang"]: r["t"] for r in
           out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    want = temperature_budgets(tot, 0.3, 40_000)
    for lang in ("en", "fr"):
        cap = min(want[lang], tot[lang])
        assert abs(got[lang] - cap) / cap < 0.25, (lang, got[lang], cap)
    # determinism: same seed → identical kept set
    again = {r["lang"]: r["t"] for r in
             temperature_sample(df, alpha=0.3, total_budget=40_000)
             .groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()}
    assert got == again
