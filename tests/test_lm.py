"""Bigram LM training + perplexity scoring."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.lm import (
    BigramLM,
    perplexity_score,
    train_bigram_lm,
)


def _ref(spark):
    rows = [(0, "the cat sat"), (1, "the cat ran"), (2, "the dog sat")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_counts_bigrams_and_contexts(spark):
    model = train_bigram_lm(_ref(spark))
    bg = {(r["w1"], r["w2"]): r["c"] for r in model.bigrams.collect()}
    assert bg[("<s>", "the")] == 3
    assert bg[("the", "cat")] == 2
    assert bg[("cat", "sat")] == 1
    assert bg[("sat", "</s>")] == 2
    cx = {r["w1"]: r["c1"] for r in model.contexts.collect()}
    assert cx["the"] == 3 and cx["<s>"] == 3 and cx["cat"] == 2
    # vocab: distinct w2 = {the,cat,dog,sat,ran,</s>} + 1 unseen
    assert model.vocab_size == 7
    with pytest.raises(ValueError):
        train_bigram_lm(_ref(spark), k=0)


def test_perplexity_hand_computed(spark):
    model = train_bigram_lm(_ref(spark), k=1.0)
    V = 7.0
    df = spark.createDataFrame([(10, "the cat")], "doc_id long, text string")
    out = perplexity_score(df, model).collect()[0]["perplexity"]
    # bigrams: (<s>,the) (the,cat) (cat,</s>)
    lp = (
        math.log((3 + 1) / (3 + V))        # <s>->the
        + math.log((2 + 1) / (3 + V))      # the->cat
        + math.log((0 + 1) / (2 + V))      # cat-></s> unseen bigram
    ) / 3
    assert math.isclose(out, math.exp(-lp), rel_tol=1e-12)


def test_reference_like_text_scores_lower(spark):
    model = train_bigram_lm(_ref(spark))
    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zz qq xx vv")],
        "doc_id long, text string")
    s = {r["doc_id"]: r["perplexity"]
         for r in perplexity_score(df, model).collect()}
    assert s[0] < s[1]


def test_unseen_context_uses_uniform_floor(spark):
    model = train_bigram_lm(_ref(spark))
    V = float(model.vocab_size)
    df = spark.createDataFrame([(0, "zz qq")], "doc_id long, text string")
    out = perplexity_score(df, model).collect()[0]["perplexity"]
    # (<s>,zz): context seen, bigram unseen; (zz,qq),(qq,</s>): unseen ctx
    lp = (
        math.log((0 + 1) / (3 + V))
        + 2 * math.log(1.0 / V)
    ) / 3
    assert math.isclose(out, math.exp(-lp), rel_tol=1e-12)


def test_null_and_empty_text_score_empty_sentence(spark):
    model = train_bigram_lm(_ref(spark))
    df = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string")
    rows = perplexity_score(df, model).collect()
    # both reduce to the single bigram (<s>, </s>): unseen, context <s>
    V = float(model.vocab_size)
    want = math.exp(-math.log((0 + 1) / (3 + V)))
    for r in rows:
        assert math.isclose(r["perplexity"], want, rel_tol=1e-12)


def test_score_plan_python_free_broadcast(spark):
    model = train_bigram_lm(_ref(spark))
    out = perplexity_score(_ref(spark), model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_perplexity_score_composes_with_streaming(spark, tmp_path):
    # the per-doc mean is an aggregation, so streaming goes through
    # foreachBatch (the repo's pattern for aggregating ops): each
    # micro-batch is scored with full batch semantics against the
    # static count tables — no cross-batch state needed, a document
    # arrives whole within one batch
    model = train_bigram_lm(_ref(spark))
    df = spark.createDataFrame(
        [(0, "the cat sat"), (1, "zz qq xx")], "doc_id long, text string")
    src = str(tmp_path / "lm_stream_src")
    df.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    got = {}

    def handle(batch, _bid):
        for r in perplexity_score(batch, model).collect():
            got[r["doc_id"]] = r["perplexity"]

    q = (stream.writeStream.foreachBatch(handle)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    want = {r["doc_id"]: r["perplexity"]
            for r in perplexity_score(df, model).collect()}
    assert got == want
