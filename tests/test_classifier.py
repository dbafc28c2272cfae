"""Hashed n-gram logistic quality classifier."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.classifier import (
    HashedLRModel,
    score_hashed_lr,
    train_hashed_lr,
)


def _labeled(spark):
    pos = [
        "the quick brown fox jumps over the lazy dog",
        "a well written sentence with proper words",
        "the cat sat on the mat and purred softly",
        "clear prose is the mark of quality text",
    ]
    neg = [
        "buy cheap now click here buy cheap now",
        "zzz qqq xxx spam spam spam click click",
        "win win win free free free click now",
        "qqq zzz buy buy buy cheap cheap cheap",
    ]
    rows = [(i, t, 1) for i, t in enumerate(pos)] + [
        (100 + i, t, 0) for i, t in enumerate(neg)]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_separates_pos_from_neg(spark):
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=256, max_iter=30,
                            learning_rate=100.0, bias_learning_rate=1.0)
    scored = score_hashed_lr(df, model)
    s = {r["doc_id"]: r["quality_score"] for r in scored.collect()}
    pos = [s[i] for i in range(4)]
    neg = [s[100 + i] for i in range(4)]
    assert min(pos) > max(neg), (pos, neg)
    assert all(0.0 < v < 1.0 for v in s.values())


def test_training_is_deterministic(spark):
    df = _labeled(spark)
    a = train_hashed_lr(df, "label", n_buckets=128, max_iter=5)
    b = train_hashed_lr(df, "label", n_buckets=128, max_iter=5)
    assert a.weights == b.weights and a.bias == b.bias


def test_zero_iter_model_scores_prior(spark):
    # balanced labels -> prior logit 0 -> every doc scores 0.5
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=64, max_iter=0)
    assert model.weights == [0.0] * 64 and model.bias == 0.0
    scored = score_hashed_lr(df, model)
    for r in scored.collect():
        assert math.isclose(r["quality_score"], 0.5, rel_tol=1e-12)
    # unbalanced labels -> bias starts at logit(pos/n)
    skew = df.where(F.col("doc_id") != 103)  # 4 pos, 3 neg
    m2 = train_hashed_lr(skew, "label", n_buckets=64, max_iter=0)
    assert math.isclose(m2.bias, math.log((4 / 7) / (3 / 7)), rel_tol=1e-12)


def test_score_handles_null_and_empty_text(spark):
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=128, max_iter=5)
    extra = spark.createDataFrame(
        [(500, None, 0), (501, "", 0)], "doc_id long, text string, label int")
    scored = score_hashed_lr(extra, model)
    want = 1.0 / (1.0 + math.exp(-model.bias))
    for r in scored.collect():
        assert math.isclose(r["quality_score"], want, rel_tol=1e-12)


def test_empty_input_raises(spark):
    df = _labeled(spark).where(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        train_hashed_lr(df, "label", n_buckets=32)


def test_gd_step_matches_hand_computation(spark):
    # one doc "a a" (label 1), one doc "b" (label 0): after one
    # iteration from w=0,b=0 the gradient is computable by hand.
    # residuals at w=0: sigma(0) - y -> -0.5 (doc 0), +0.5 (doc 1);
    # grad[k] = sum_docs(cnt*r)/n; step = -grad. Expected buckets come
    # from the featurizer itself so collisions can't break the test.
    from collections import Counter

    from generalized_kmeans_clustering_spark.operators.dsir import (
        dsir_ngram_buckets,
    )

    df = spark.createDataFrame(
        [(0, "a a", 1), (1, "b", 0)], "doc_id long, text string, label int")
    B = 8
    rows = df.select(
        "doc_id",
        dsir_ngram_buckets(F.col("text"), B, 0, "md5").alias("bk"),
    ).collect()
    buckets = {r["doc_id"]: Counter(r["bk"]) for r in rows}
    assert sum(buckets[0].values()) == 3  # 'a','a','a a'
    assert sum(buckets[1].values()) == 1  # 'b'
    expected = [0.0] * B
    for doc, resid in ((0, -0.5), (1, 0.5)):  # balanced prior: b0=0
        total = sum(buckets[doc].values())
        for k, cnt in buckets[doc].items():
            expected[k] -= 1.0 * ((cnt / total) * resid) / 2.0
    model = train_hashed_lr(df, "label", n_buckets=B, max_iter=1,
                            learning_rate=1.0, hash_fn="md5")
    assert model.weights == pytest.approx(expected)
    assert model.bias == pytest.approx(0.0)  # residuals cancel


def test_train_strategies_agree(spark):
    df = _labeled(spark)
    a = train_hashed_lr(df, "label", n_buckets=128, max_iter=6,
                        learning_rate=50.0, bias_learning_rate=1.0,
                        strategy="expression")
    b = train_hashed_lr(df, "label", n_buckets=128, max_iter=6,
                        learning_rate=50.0, bias_learning_rate=1.0,
                        strategy="join")
    assert a.bias == pytest.approx(b.bias, rel=1e-9)
    for x, y in zip(a.weights, b.weights):
        assert x == pytest.approx(y, rel=1e-9, abs=1e-12)
    with pytest.raises(ValueError, match="strategy"):
        train_hashed_lr(df, "label", strategy="bogus")


def test_pareto_filter_keeps_high_scores_and_is_deterministic(spark):
    from generalized_kmeans_clustering_spark.operators.classifier import (
        pareto_quality_filter,
    )

    rows = [(i, 0.95) for i in range(200)] + [
        (1000 + i, 0.05) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, quality_score double")
    kept = pareto_quality_filter(df, alpha=9.0)
    hi = kept.where("doc_id < 1000").count()
    lo = kept.where("doc_id >= 1000").count()
    # P(keep | 0.95) = P(pareto > 0.05) = (1.05)^-9 ~ 0.64
    # P(keep | 0.05) = P(pareto > 0.95) = (1.95)^-9 ~ 0.0025
    assert hi > 90 and lo < 20, (hi, lo)
    again = pareto_quality_filter(df, alpha=9.0)
    assert sorted(r["doc_id"] for r in kept.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    with pytest.raises(ValueError):
        pareto_quality_filter(df, alpha=0)


def test_expression_scoring_matches_join_scoring(spark):
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=128, max_iter=8,
                            learning_rate=50.0, bias_learning_rate=1.0)
    a = {r["doc_id"]: r["quality_score"]
         for r in score_hashed_lr(df, model, method="join").collect()}
    b = {r["doc_id"]: r["quality_score"]
         for r in score_hashed_lr(df, model,
                                  method="expression").collect()}
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=1e-9), k
    # expression path is a pure projection: no Exchange at all
    plan = score_hashed_lr(df, model, method="expression") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    with pytest.raises(ValueError, match="method"):
        score_hashed_lr(df, model, method="bogus")


def test_expression_scoring_composes_with_streaming(spark, tmp_path):
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=128, max_iter=8,
                            learning_rate=50.0, bias_learning_rate=1.0)
    src = str(tmp_path / "stream_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(
        "doc_id long, text string, label int").parquet(src)
    scored = score_hashed_lr(stream, model, method="expression")
    q = (scored.writeStream.format("memory").queryName("quality_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["quality_score"]
           for r in spark.sql("SELECT * FROM quality_sink").collect()}
    want = {r["doc_id"]: r["quality_score"]
            for r in score_hashed_lr(df, model,
                                     method="expression").collect()}
    assert got.keys() == want.keys()
    for k in got:
        assert math.isclose(got[k], want[k], rel_tol=1e-12), k


def test_plan_is_python_free(spark):
    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=64, max_iter=2)
    scored = score_hashed_lr(df, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_lr_model_roundtrip(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.classifier import (
        read_lr_model, write_lr_model,
    )

    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=64, max_iter=4,
                            learning_rate=50.0, bias_learning_rate=1.0,
                            hash_fn="md5")
    path = str(tmp_path / "lr_model")
    write_lr_model(spark, model, path)
    loaded = read_lr_model(spark, path)
    assert loaded.weights == model.weights
    assert loaded.bias == model.bias
    assert (loaded.n_buckets, loaded.seed, loaded.hash_fn) == \
        (model.n_buckets, model.seed, model.hash_fn)
    a = {r["doc_id"]: r["quality_score"]
         for r in score_hashed_lr(df, model).collect()}
    b = {r["doc_id"]: r["quality_score"]
         for r in score_hashed_lr(df, loaded).collect()}
    assert a == b


def test_fused_strategy_matches_join(spark):
    """strategy='fused' (one job/iteration, per-doc feature arrays)
    must produce the same model as the join strategy up to float
    summation grouping (~1e-9 after 5 iterations)."""
    rows = (
        [(i, "good clean text with words " * 3, 1) for i in range(30)]
        + [(100 + i, "spam buy now click here " * 3, 0) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    a = train_hashed_lr(df, "label", n_buckets=128, max_iter=5,
                        learning_rate=100.0, strategy="join")
    b = train_hashed_lr(df, "label", n_buckets=128, max_iter=5,
                        learning_rate=100.0, strategy="fused")
    assert abs(a.bias - b.bias) < 1e-9
    assert max(abs(x - y) for x, y in zip(a.weights, b.weights)) < 1e-9
    import pytest as _pt

    with _pt.raises(ValueError, match="strategy"):
        train_hashed_lr(df, "label", strategy="sgd")


def test_fused_model_scores_and_roundtrips(spark, tmp_path):
    """The fused (Arrow) trainer must hand back plain-float weights
    that survive score_hashed_lr's createDataFrame and sidecar
    persistence (r12 regression guard: the numpy gradient loop
    returned numpy.float64 weights, which Spark's DoubleType
    verifier rejects)."""
    from generalized_kmeans_clustering_spark.operators.classifier import (
        read_lr_model, write_lr_model,
    )

    df = _labeled(spark)
    model = train_hashed_lr(df, "label", n_buckets=64, max_iter=2,
                            learning_rate=50.0, strategy="fused")
    assert all(type(x) is float for x in model.weights)
    assert type(model.bias) is float
    scored = score_hashed_lr(df, model)
    n = scored.where(F.col("quality_score").isNotNull()).count()
    assert n == df.count()
    path = str(tmp_path / "fused_model")
    write_lr_model(spark, model, path)
    loaded = read_lr_model(spark, path)
    assert loaded.weights == model.weights
