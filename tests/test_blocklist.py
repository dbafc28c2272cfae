"""Multi-pattern blocklist matching (operators/blocklist.py):
token/phrase semantics, case folding, occurrence counting, the
prepare_corpus rule integration, and the broadcast-only plan shape."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.blocklist import (
    blocklist_hits, blocklist_rule,
)
from generalized_kmeans_clustering_spark.operators.corpus import (
    prepare_corpus,
)


def _docs(spark):
    return spark.createDataFrame(
        [(0, "Buy CHEAP pills now cheap pills"),
         (1, "a normal document"),
         (2, "click here to win"),
         (3, ""),
         (4, "cheap Click Here deal"),
         (5, "clicks here")],  # no token match: 'clicks' != 'click'
        "doc_id long, text string")


def test_hits_words_phrases_and_counts(spark):
    out = {r["doc_id"]: r for r in blocklist_hits(
        _docs(spark), ["cheap", "click here", "win"]).collect()}
    assert set(out) == {0, 2, 4}
    assert out[0]["n_hits"] == 2  # 'cheap' twice (case-folded)
    assert out[0]["matched_patterns"] == ["cheap"]
    assert out[2]["n_hits"] == 2 and out[2]["n_distinct_patterns"] == 2
    assert out[2]["matched_patterns"] == ["click here", "win"]
    assert out[4]["matched_patterns"] == ["cheap", "click here"]


def test_exact_token_matching_no_substrings(spark):
    # token semantics: 'clicks' does not match 'click', phrase order
    # matters, and a phrase longer than the doc never matches
    out = blocklist_hits(_docs(spark), ["click", "here click",
                                        "a very long phrase beyond docs"])
    got = {r["doc_id"]: r["matched_patterns"] for r in out.collect()}
    assert got == {2: ["click"], 4: ["click"]}


def test_case_sensitivity_toggle(spark):
    out = blocklist_hits(_docs(spark), ["cheap"], lowercase=False)
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got == {0: 1, 4: 1}  # only the literal-case occurrences


def test_pattern_validation_and_dedup(spark):
    with pytest.raises(ValueError):
        blocklist_hits(_docs(spark), [])
    with pytest.raises(ValueError):
        blocklist_hits(_docs(spark), ["", "   "])
    # duplicate and whitespace-ragged patterns collapse
    a = blocklist_hits(_docs(spark), ["cheap"]).collect()
    b = blocklist_hits(_docs(spark), ["cheap", "CHEAP", "  cheap  "]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_prepare_corpus_rule_integration(spark):
    docs = _docs(spark).withColumn("lang", F.lit("en")) \
        .withColumn("source", F.lit("s"))
    with_hits, rule = blocklist_rule(docs, ["cheap", "click here"])
    prepared = prepare_corpus(
        with_hits, min_tokens=0, dedup=None, extra_rules=[rule])
    verdict = {r["doc_id"]: (r["keep"], r["reject_reason"])
               for r in prepared.select(
                   "doc_id", "keep", "reject_reason").collect()}
    assert verdict[0] == (False, "blocklisted")
    assert verdict[2] == (False, "blocklisted")
    assert verdict[4] == (False, "blocklisted")
    assert verdict[1][0] and verdict[5][0]
    # max_hits loosens the rule
    with_hits2, rule2 = blocklist_rule(docs, ["cheap", "click here"],
                                       max_hits=1)
    prepared2 = prepare_corpus(
        with_hits2, min_tokens=0, dedup=None, extra_rules=[rule2])
    verdict2 = {r["doc_id"]: r["keep"]
                for r in prepared2.select("doc_id", "keep").collect()}
    assert not verdict2[0] and not verdict2[4]  # 2 hits > 1
    assert verdict2[2] is False or verdict2[2] is True  # 1 hit ≤ 1 → kept
    assert verdict2[2]


def test_plan_is_broadcast_only(spark):
    plan = blocklist_hits(_docs(spark), ["cheap", "click here"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_on_testdata_scan(spark, sf_dir):
    """Runs over the real documents table; hit counts are consistent
    with an independent rlike-based count for a single-word pattern."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # pick a word guaranteed present in the synthetic vocabulary
    word = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("t")) \
        .where(F.col("t") != "").groupBy("t").count() \
        .orderBy(F.desc("count")).first()["t"]
    got = blocklist_hits(docs, [word])
    n_docs_hit = got.count()
    expect = docs.where(
        F.array_contains(F.split(F.lower("text"), " "), word)).count()
    assert n_docs_hit == expect
    total = got.agg(F.sum("n_hits")).first()[0]
    per_doc = docs.select(F.size(F.filter(
        F.split(F.lower("text"), " "), lambda x: x == F.lit(word))
    ).alias("n")).agg(F.sum("n")).first()[0]
    assert total == per_doc


def test_rule_rejects_chained_hit_column(spark):
    """Chaining blocklist_rule outputs would make both predicates read
    the same n_blocklist_hits column (ambiguous join + silent aliasing)
    — raise instead (r12 advisor)."""
    docs = _docs(spark)
    with_hits, _ = blocklist_rule(docs, ["cheap"])
    with pytest.raises(ValueError, match="n_blocklist_hits"):
        blocklist_rule(with_hits, ["click here"])
