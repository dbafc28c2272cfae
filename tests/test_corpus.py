"""Corpus-preparation pipeline (operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.corpus import (
    corpus_stats, prepare_corpus,
)


@pytest.fixture(scope="module")
def docs(spark):
    long_en = ("the quick brown fox jumps over the lazy dog and then "
               "the dog chases the fox around the big green field all day") * 2
    rows = [
        (1, long_en),
        (2, long_en),                       # exact dup of 1
        (3, "the and is short"),            # too short
        (4, "der hund und die katze laufen durch den park und spielen "
            "mit dem ball den ganzen tag lang immer wieder und wieder"),
        # English markers so the language rule passes, but digit-heavy
        # and short → quality_score below the 0.2 floor
        (5, "the 111 and 222 is 333 of 444 the 555 and 666 is 777"),
        (6, long_en + " with one extra tail sentence for the pair test"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_signals_and_rule_reasons(spark, docs):
    out = {r["doc_id"]: r for r in prepare_corpus(
        docs, min_tokens=10, languages=["en"], min_quality=0.2,
        dedup="exact",
    ).collect()}
    assert out[1]["keep"] and out[1]["reject_reason"] is None
    assert out[2]["reject_reason"] == "duplicate"
    assert out[3]["reject_reason"] == "too_short"
    assert out[4]["reject_reason"] == "language"  # German markers
    assert out[5]["reject_reason"] == "low_quality"
    assert out[6]["keep"]
    assert all("n_tokens" in r.asDict() and "lang" in r.asDict()
               for r in out.values())


def test_rule_precedence_first_failure_wins(spark, docs):
    # doc 3 is both too short AND quality-poor: too_short names it
    out = {r["doc_id"]: r["reject_reason"] for r in prepare_corpus(
        docs, min_tokens=10, min_quality=0.9, dedup=None).collect()}
    assert out[3] == "too_short"


def test_minhash_dedup_marks_near_dup_non_canonical(spark, docs):
    out = {r["doc_id"]: r for r in prepare_corpus(
        docs, min_tokens=10, dedup="minhash", minhash_threshold=0.5,
        num_hashes=16, num_bands=4,
    ).collect()}
    # 1, 2, 6 are one near-dup component; 6 has the longest text → kept
    assert out[6]["keep"]
    assert out[1]["reject_reason"] == "duplicate"
    assert out[2]["reject_reason"] == "duplicate"
    assert out[4]["keep"]  # German text passes (no language rule here)


def test_filtered_rows_do_not_join_dedup(spark):
    # the duplicate of a REJECTED doc survives: dedup runs among
    # passers only
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny"),
         (3, "a properly long document with plenty of words to pass "
             "the minimum token requirement set below for this test")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["reject_reason"] for r in prepare_corpus(
        docs, min_tokens=5, dedup="exact").collect()}
    assert out[1] == "too_short" and out[2] == "too_short"
    assert out[3] is None


def test_corpus_stats_rollup(spark, docs):
    prepared = prepare_corpus(docs, min_tokens=10, languages=["en"],
                              min_quality=0.2, dedup="exact")
    stats = {r["outcome"]: (r["n_docs"], r["n_tokens"])
             for r in corpus_stats(prepared).collect()}
    assert stats["kept"][0] == 2
    assert stats["duplicate"][0] == 1
    assert stats["too_short"][0] == 1
    assert stats["language"][0] == 1
    assert stats["low_quality"][0] == 1
    assert sum(n for n, _ in stats.values()) == 6


def test_invalid_dedup_mode(spark, docs):
    with pytest.raises(ValueError):
        prepare_corpus(docs, dedup="bogus")


def test_pairs_mode_uses_external_evidence(spark):
    """dedup='pairs' consumes caller-supplied near-dup pairs (e.g. from
    embedding cosine) and still restricts resolution to passing rows."""
    docs = spark.createDataFrame(
        [(1, "a sufficiently long document about one topic here today"),
         (2, "a sufficiently long document on another topic over there"),
         (3, "short"),
         (4, "a third long document that is like the first one in spirit")],
        "doc_id long, text string")
    # external evidence: 1~4 near-dups; 1~3 too, but 3 fails min_tokens
    pairs = spark.createDataFrame([(1, 4), (1, 3)], "i long, j long")
    out = {r["doc_id"]: r for r in prepare_corpus(
        docs, min_tokens=5, dedup="pairs", dedup_pairs=pairs).collect()}
    # 4 has longer text? canonical = longest text in {1,4}
    comp_kept = [d for d in (1, 4) if out[d]["keep"]]
    assert len(comp_kept) == 1
    assert out[3]["reject_reason"] == "too_short"  # not 'duplicate'
    assert out[2]["keep"]
    with pytest.raises(ValueError):
        prepare_corpus(docs, dedup="pairs")


def test_repetition_rule_and_pii_redaction(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat and then walked away to the garden "
             "where it found a warm sunny spot for an afternoon nap"),
         (2, "loop the loop " * 20),
         (3, "write to admin@site.example.org for all of the details and "
             "the rest of the information about the upcoming meeting")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in prepare_corpus(
        docs, min_tokens=5, max_repetition=0.5, redact_pii=True,
        dedup=None).collect()}
    assert out[2]["reject_reason"] == "repetitive"
    assert out[1]["keep"] and out[3]["keep"]
    assert "<EMAIL>" in out[3]["text"]
    assert "admin@site" not in out[3]["text"]
    assert "repetition" in out[1].asDict()


def test_exact_dedup_null_text_rows_group(spark):
    """NULL-text rows share a NULL fingerprint and must dedup against
    each other (null-SAFE group join) — a null-unsafe equi-join would
    silently keep every NULL-text row."""
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "the quick brown fox and the dog")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["reject_reason"]
           for r in prepare_corpus(docs, dedup="exact").collect()}
    assert out[1] is None
    assert out[2] == "duplicate"
    assert out[3] is None


def test_prepare_corpus_line_dedup_prestage(spark):
    """Boilerplate removal runs FIRST: signals and document-level dedup
    see the cleaned text, and the line-audit columns ride through."""
    banner = "subscribe to the newsletter for more updates"
    body_a = "the quick brown fox jumps over the lazy dog today"
    body_b = "an entirely different body of english text is right here"
    docs = spark.createDataFrame(
        [(1, f"{banner}\n{body_a}"),
         (2, f"{banner}\n{body_b}"),
         (3, f"{banner}\n{body_a}")],   # same body as 1 after cleaning
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in prepare_corpus(
        docs, min_tokens=5, dedup="exact",
        dedup_lines_max_occurrences=2).collect()}
    # banner (3 occurrences > 2) stripped everywhere
    assert all(banner not in out[i]["text"] for i in (1, 2, 3))
    assert out[1]["n_lines_dropped"] == 1
    # doc 3 is now an exact duplicate of doc 1's CLEANED text
    assert out[1]["reject_reason"] is None
    assert out[3]["reject_reason"] == "duplicate"
    assert out[2]["reject_reason"] is None
    # n_tokens computed on cleaned text (banner words gone)
    assert out[1]["n_tokens"] == len(body_a.split(" "))


def test_prepare_corpus_extra_rules_model_signal(spark):
    from pyspark.sql import functions as F

    from generalized_kmeans_clustering_spark.operators.corpus import (
        prepare_corpus,
    )
    from generalized_kmeans_clustering_spark.operators.lm import (
        perplexity_score, train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat today here now"),
         (1, "the dog sat on the mat today here now"),
         (2, "zz qq xx vv ww uu tt ss rr pp")],
        "doc_id long, text string")
    model = train_bigram_lm(docs.where("doc_id < 2"))
    scored = perplexity_score(docs, model)
    thr = scored.where("doc_id < 2").agg(
        F.max("perplexity")).first()[0] * 1.5
    out = prepare_corpus(
        scored, min_tokens=2, dedup=None,
        extra_rules=[(F.col("perplexity") > thr, "high_perplexity")],
    )
    got = {r["doc_id"]: r["reject_reason"] for r in out.collect()}
    assert got[0] is None and got[1] is None
    assert got[2] == "high_perplexity"
    # built-in rules keep precedence over extra rules
    out2 = prepare_corpus(
        scored, min_tokens=100, dedup=None,
        extra_rules=[(F.col("perplexity") > thr, "high_perplexity")],
    )
    assert all(r["reject_reason"] == "too_short" for r in out2.collect())


def test_source_rollup_signals(spark):
    """Per-source dashboard: doc/token counts, mean quality, and the
    exact-dup rate from content fingerprints; NULL texts count as docs
    but contribute nothing else."""
    from generalized_kmeans_clustering_spark.operators.corpus import (
        source_rollup,
    )

    rows = [
        (0, "web", "clean long text with many informative words here"),
        (1, "web", "clean long text with many informative words here"),
        (2, "web", "different web page content entirely new words"),
        (3, "spam", "!!! 123 !!! 456 !!!"),
        (4, "spam", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r.asDict() for r in source_rollup(df).collect()}
    assert out["web"]["n_docs"] == 3
    # 3 docs, 2 distinct fingerprints -> dup rate 1/3
    assert abs(out["web"]["exact_dup_rate"] - 1 / 3) < 1e-9
    assert out["web"]["avg_quality"] > out["spam"]["avg_quality"]
    assert out["spam"]["n_docs"] == 2  # NULL text still counts as a doc
    assert out["spam"]["exact_dup_rate"] == 0.0


def test_prepare_corpus_max_per_source(spark):
    from generalized_kmeans_clustering_spark.operators.corpus import (
        prepare_corpus,
    )

    rows = []
    for i in range(12):
        rows.append((i, "the quick brown fox jumps over the lazy dog "
                     "and then keeps on running through the field " * 3,
                     "big" if i < 10 else "small"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = prepare_corpus(df, min_tokens=5, dedup=None, max_per_source=4)
    by = {r["doc_id"]: r for r in out.collect()}
    kept_big = [i for i in range(10) if by[i]["keep"]]
    assert len(kept_big) == 4
    capped = [i for i in range(10) if by[i]["reject_reason"] == "source_cap"]
    assert len(capped) == 6
    # the small source is under its cap: everything kept
    assert by[10]["keep"] and by[11]["keep"]
    # determinism across partitionings
    out2 = prepare_corpus(df.repartition(5), min_tokens=5, dedup=None,
                          max_per_source=4)
    kept2 = {r["doc_id"] for r in out2.collect() if r["keep"]}
    assert kept2 == {r for r in by if by[r]["keep"]}


def test_prepare_corpus_cap_ignores_rejected_rows(spark):
    from generalized_kmeans_clustering_spark.operators.corpus import (
        prepare_corpus,
    )

    long_text = ("a perfectly reasonable document with plenty of words "
                 "to pass the minimum token rule easily " * 2)
    rows = [(i, long_text if i >= 8 else "short", "s") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = prepare_corpus(df, min_tokens=10, dedup=None, max_per_source=4)
    by = {r["doc_id"]: r for r in out.collect()}
    # 8 short docs rejected by the content rule, not the cap
    assert all(by[i]["reject_reason"] == "too_short" for i in range(8))
    # all 4 passing docs fit the cap: rejected rows consumed no slots
    assert all(by[i]["keep"] for i in range(8, 12))
