"""Whole-stage-codegen health: the hot map stages must actually
compile. janino's 64 KB per-method limit is a silent failure mode —
Spark falls back to interpreted execution (spark.sql.codegen.fallback
defaults true) and the only symptom is a log line and a slow stage.
These tests disable the fallback so an expression tree that outgrows
codegen FAILS here instead of quietly de-optimizing a 100 TB run.

Regression context: the corpus_prepare signal projection originally
inlined the language-ID score arithmetic ~180× (argmax CASE references
each score ~5×, filter pushdown substituted the whole alias chain into
one scan predicate) → 1.4 MB of generated source, interpreted
execution. Fixed by staging score columns, a reference-efficient
array_max argmax, a filter-free exact-dedup formulation, and a
nondeterministic pushdown barrier on the minhash path.
"""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.corpus import (
    corpus_stats, prepare_corpus,
)


@pytest.fixture()
def strict_codegen(spark):
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.conf.set("spark.sql.codegen.fallback", old)


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and then the "
            "dog chases the fox around the big green field all day ")
    rows = [(i, base + f"variant {i % 7}") for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_prepare_exact_compiles(strict_codegen, docs):
    out = prepare_corpus(docs, min_tokens=8, languages=["en"],
                         min_quality=0.05, dedup="exact")
    assert out.count() == 40
    assert corpus_stats(out).count() >= 1


def test_corpus_prepare_minhash_compiles(strict_codegen, docs):
    out = prepare_corpus(docs, min_tokens=8, languages=["en"],
                         min_quality=0.05, max_repetition=0.9,
                         dedup="minhash", minhash_threshold=0.8)
    assert out.count() == 40


def test_corpus_prepare_full_signals_compile(strict_codegen, docs):
    out = prepare_corpus(docs, min_tokens=2, max_tokens=10_000,
                         languages=["en", "de"], min_quality=0.01,
                         max_repetition=0.99, redact_pii=True,
                         dedup="exact")
    assert out.count() == 40


def test_language_id_inline_compiles(strict_codegen, docs):
    """Standalone language_id must stay codegen-compilable even when a
    filter substitutes it into the scan predicate."""
    from generalized_kmeans_clustering_spark.functions import text as Tx

    n = docs.where(Tx.language_id(F.col("text")) == "en").count()
    assert n == 40


def test_round7_operators_compile_strict(strict_codegen, docs):
    """Round-7 expression-heavy operators under fallback-disabled
    codegen: the span cut (per-token coverage lambda), the 9-n Gopher
    window pass, and the decontamination max must all compile (HOF
    bodies are interpreted by design in Spark 4.1 — these assert the
    SURROUNDING stages don't silently de-optimize)."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_spans,
    )
    from generalized_kmeans_clustering_spark.operators.text_features \
        import gopher_repetition_signals

    assert drop_repeated_spans(docs, n=6).count() == 40
    assert gopher_repetition_signals(docs).count() == 40


def test_semantic_split_and_decontaminate_compile_strict(strict_codegen,
                                                         spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.decontamination \
        import semantic_decontaminate
    from generalized_kmeans_clustering_spark.operators.semantic import (
        semantic_near_dup_pairs,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(0, 1, 4)])
            for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, _ = ivf_index(emb, n_lists=2, seed=0, max_iter=1)
    # cap low enough to engage the recursive split under strict codegen
    semantic_near_dup_pairs(indexed, 0.9, list_size_cap=30).count()
    semantic_decontaminate(
        emb.where(F.col("vec_id") >= 10),
        emb.where(F.col("vec_id") < 10), 0.9).count()


def test_session_new_operators_compile_strict(strict_codegen, docs, spark):
    """This round's second-wave operators under fallback-disabled
    codegen: normalization fingerprints, drift gauges, collocations,
    SQ encode/top-k, agreement contingency, rolling z-score."""
    import datetime

    from generalized_kmeans_clustering_spark.agreement import (
        agreement_metrics,
    )
    from generalized_kmeans_clustering_spark.functions.text import (
        normalized_fingerprint,
    )
    from generalized_kmeans_clustering_spark.operators.drift import (
        corpus_drift,
    )
    from generalized_kmeans_clustering_spark.operators.quantization import (
        sq_encode, sq_topk, train_sq,
    )
    from generalized_kmeans_clustering_spark.operators.rollup import (
        rolling_zscore,
    )
    from generalized_kmeans_clustering_spark.operators.sampling import (
        cap_per_group,
    )
    from generalized_kmeans_clustering_spark.operators.text_features import (
        top_collocations,
    )

    assert docs.select(normalized_fingerprint(F.col("text"))).count() == 40
    assert corpus_drift(docs.where("doc_id % 2 = 0"),
                        docs.where("doc_id % 2 = 1")).count() == 1
    assert top_collocations(docs, k=5, min_count=2).count() == 5
    emb = spark.createDataFrame(
        [(i, [float(i), float(40 - i)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    m = train_sq(emb)
    assert sq_topk(sq_encode(emb, m), m, emb.where("vec_id < 2"), k=3,
                   max_broadcast_queries=None).count() == 6
    pred = docs.select(
        (F.col("doc_id") % 3).alias("label"),
        (F.col("doc_id") % 2).alias("pred"))
    assert agreement_metrics(pred, "label", "pred").count() == 1
    base = datetime.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=i), "t", float(i % 7))
         for i in range(30)],
        "event_id long, ts timestamp, event_type string, value double")
    srcs = docs.withColumn("source", (F.col("doc_id") % 3).cast("string"))
    assert cap_per_group(srcs, 5, group_col="source").count() == 15
    assert rolling_zscore(ev, lookback=10, min_history=5).count() == 30


def test_temporal_audit_operators_compile_strict(strict_codegen, docs,
                                                 spark):
    """Third-wave round-7 operators under fallback-disabled codegen:
    as-of join, range join, rollup cascade, chunking, quantiles,
    funnel, flag propagation."""
    import datetime

    from generalized_kmeans_clustering_spark.operators.graph import (
        propagate_flags,
    )
    from generalized_kmeans_clustering_spark.operators.rollup import (
        funnel_rollup,
    )
    from generalized_kmeans_clustering_spark.operators.stats import (
        quantiles_by_key,
    )
    from generalized_kmeans_clustering_spark.operators.temporal import (
        asof_join, range_interval_join, rollup_cascade,
    )
    from generalized_kmeans_clustering_spark.operators.text_features import (
        chunk_documents,
    )

    base = datetime.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(i, base + datetime.timedelta(seconds=37 * i),
          ["view", "click", "purchase", "error"][i % 4], float(i % 9))
         for i in range(60)],
        "event_id long, ts timestamp, event_type string, value double")
    right = (ev.where("event_type = 'error'")
             .select("event_id", F.col("ts").alias("rts"),
                     F.col("value").alias("rv")))
    assert asof_join(ev.select("event_id", "ts"), right, "event_id",
                     "ts", "rts", ["rv"]).count() == 60
    iv = ev.select(
        F.col("event_id").alias("ik"), F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("e"))
    assert range_interval_join(
        ev.select(F.col("event_id").alias("k"), "ts"), iv,
        "k", "ik", "ts", "s", "e", bucket_seconds=60.0).count() == 60
    assert rollup_cascade(ev, "ts", "value", ("minute", "hour")).count() > 0
    assert chunk_documents(docs, size=40, overlap=8).count() > 40
    assert quantiles_by_key(
        docs.withColumn("src", (F.col("doc_id") % 3).cast("string")),
        "src", "doc_id", qs=(0.5, 0.9)).count() == 3
    assert funnel_rollup(
        ev.withColumnRenamed("event_id", "user_id"),
        ["view", "click"]).count() == 2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    assert propagate_flags(edges, seeds, rounds=2).count() == 3


def test_q9_broadcast_joins_below_the_shuffle_join(spark, tmp_path):
    """Plan-shape regression for the r7-verdict Q9 finding: the
    selective broadcast dimension joins must prune the fact table
    BEFORE the one big shuffle join (written order is plan order with
    CBO off) — joining orders first would shuffle ALL of lineitem and
    filter after."""
    import __spark_entry__ as em

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        df = em.queries()["profit_by_nation_year"](
            spark, "/root/testdata/sf0.001")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString() \
            .split("== Initial Plan ==")[0]
        lines = plan.splitlines()
        bj = [i for i, l in enumerate(lines) if "BroadcastHashJoin" in l]
        smj = [i for i, l in enumerate(lines)
               if "SortMergeJoin" in l or "ShuffledHashJoin" in l]
        assert len(bj) == 3 and len(smj) == 1, plan
        assert all(i > smj[0] for i in bj), \
            "broadcast joins must sit below the shuffle join"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
