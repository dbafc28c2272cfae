"""BM25 top-k retrieval and reciprocal-rank fusion
(operators/retrieval.py): hand-computed scores, ranking determinism,
inverted-index candidate semantics, and the fusion arithmetic."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.retrieval import (
    bm25_postings, bm25_topk, rrf_fuse,
)

K1, B = 1.2, 0.75


def _docs(spark):
    return spark.createDataFrame(
        [(0, "the cat sat on the mat"),
         (1, "the dog ate my homework"),
         (2, "cat dog cat"),
         (3, ""),
         (4, "quantum flux capacitor")],
        "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(100, "cat dog"), (101, "homework"), (102, "unseen words only")],
        "query_id long, query_text string")


def _ref_bm25(corpus, qtext, k1=K1, b=B):
    """The single independent reference implementation (plain Okapi,
    Lucene idf): {doc: score} for all docs with a positive score."""
    toks = {d: [t for t in s.split(" ") if t] for d, s in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfm = {}
    for ts in toks.values():
        for t in set(ts):
            dfm[t] = dfm.get(t, 0) + 1
    scores = {}
    for d, ts in toks.items():
        s = 0.0
        for t in set(qtext.split()):
            tf = ts.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfm[t] + 0.5) / (dfm[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


def _hand_bm25(corpus, query, doc):
    return _ref_bm25(corpus, query).get(doc, 0.0)


def test_bm25_matches_hand_computation(spark):
    corpus = {0: "the cat sat on the mat", 1: "the dog ate my homework",
              2: "cat dog cat", 3: "", 4: "quantum flux capacitor"}
    out = {(r["query_id"], r["doc_id"]): r["score"]
           for r in bm25_topk(_docs(spark), _queries(spark), k=5).collect()}
    for (qid, qtext) in [(100, "cat dog"), (101, "homework")]:
        for d in corpus:
            expect = _hand_bm25(corpus, qtext, d)
            if expect > 0:
                assert out[(qid, d)] == pytest.approx(expect, abs=1e-6)
            else:
                assert (qid, d) not in out  # no posting → no candidate


def test_bm25_ranking_and_candidates(spark):
    rows = bm25_topk(_docs(spark), _queries(spark), k=5) \
        .orderBy("query_id", "rank").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # "cat dog": doc 2 (two cats + a dog, short) must lead; docs 0 and 1
    # each match one term; docs 3/4 never appear (inverted-index access).
    assert [r["doc_id"] for r in by_q[100]][0] == 2
    assert {r["doc_id"] for r in by_q[100]} == {0, 1, 2}
    # single-term query hits only the matching doc
    assert [(r["doc_id"], r["rank"]) for r in by_q[101]] == [(1, 1)]
    # query with no corpus terms → zero candidate rows, not zero scores
    assert 102 not in by_q
    # ranks are 1..n dense and scores non-increasing within a query
    for qid, rs in by_q.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_bm25_k_cuts_and_validation(spark):
    out = bm25_topk(_docs(spark), _queries(spark), k=1).collect()
    assert {r["query_id"]: r["doc_id"] for r in out} == {100: 2, 101: 1}
    assert all(r["rank"] == 1 for r in out)
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), _queries(spark), k=0)
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), _queries(spark), b=1.5)
    with pytest.raises(ValueError):
        bm25_topk(_docs(spark), _queries(spark), k1=-0.1)


def test_bm25_query_term_dedup(spark):
    """Repeated query terms contribute once (short-query BM25)."""
    q1 = spark.createDataFrame([(1, "cat")], "query_id long, query_text string")
    q2 = spark.createDataFrame([(1, "cat cat cat")],
                               "query_id long, query_text string")
    d = _docs(spark)
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(d, q1, k=5).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(d, q2, k=5).collect()}
    assert s1 == s2


def test_bm25_null_text_counts_as_zero_length(spark):
    """NULL text = zero-length doc: in N and avgdl (as 0), never a
    candidate. Scores must equal the hand computation under that
    contract (the r12 review caught NULL docs silently skewing avgdl
    by dropping out of the average while staying in N)."""
    docs = spark.createDataFrame(
        [(0, "cat dog"), (1, None), (2, "cat")],
        "doc_id long, text string")
    q = spark.createDataFrame([(9, "cat")],
                              "query_id long, query_text string")
    got = {r["doc_id"]: r["score"] for r in bm25_topk(docs, q, k=3).collect()}
    corpus = {0: "cat dog", 1: "", 2: "cat"}  # NULL ≡ zero-length
    for d in (0, 2):
        assert got[d] == pytest.approx(
            _hand_bm25(corpus, "cat", d), abs=1e-6)
    assert 1 not in got


def test_bm25_with_injected_postings(spark):
    """A persisted/pre-built postings table produces identical results
    to the self-contained path (the scale escape hatch), and the
    postings schema carries per-doc length."""
    d, q = _docs(spark), _queries(spark)
    p = bm25_postings(d)
    assert set(p.columns) == {"doc_id", "term", "tf", "dl"}
    # the empty doc has no postings; lengths count non-empty tokens
    dls = {r["doc_id"]: r["dl"] for r in p.select("doc_id", "dl").distinct().collect()}
    assert 3 not in dls and dls[2] == 3.0 and dls[0] == 6.0
    a = sorted(map(tuple, bm25_topk(d, q, k=5).collect()))
    b = sorted(map(tuple, bm25_topk(d, q, k=5, postings=p).collect()))
    assert a == b


def test_bm25_where_prefilters_corpus_and_stats(spark):
    """``where=`` follows the ANN family's contract: candidates AND
    collection statistics (N, avgdl, df) describe the filtered corpus
    — results equal running the search on the filtered DataFrame."""
    docs = spark.createDataFrame(
        [(0, "cat dog", "en"), (1, "cat cat dog mouse", "en"),
         (2, "cat", "de"), (3, "dog dog", "de")],
        "doc_id long, text string, lang string")
    q = spark.createDataFrame([(9, "cat dog")],
                              "query_id long, query_text string")
    filtered = sorted(map(tuple,
        bm25_topk(docs, q, k=4, where="lang = 'en'").collect()))
    manual = sorted(map(tuple,
        bm25_topk(docs.where("lang = 'en'"), q, k=4).collect()))
    assert filtered == manual
    assert {t[1] for t in filtered} == {0, 1}
    # unfiltered differs (different df/avgdl), guarding against the
    # filter silently not applying
    unfiltered = sorted(map(tuple, bm25_topk(docs, q, k=4).collect()))
    assert unfiltered != filtered
    with pytest.raises(ValueError):
        bm25_topk(docs, q, where="lang = 'en'",
                  postings=bm25_postings(docs))


def test_rrf_hand_values_and_agreement(spark):
    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int")
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([r1, r2], k0=60, k=10).collect()}
    # doc 11 appears in both systems → top, n_systems=2
    assert out[11]["n_systems"] == 2
    assert out[11]["rrf"] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[11]["rank"] == 1
    assert out[10]["rrf"] == pytest.approx(1 / 61, abs=1e-6)
    assert out[13]["rrf"] == pytest.approx(1 / 62, abs=1e-6)
    assert out[12]["rrf"] == pytest.approx(1 / 63, abs=1e-6)
    # equal-rrf ties break on ascending doc_id: 10 (1/61) < 13 (1/62) < 12
    assert [out[d]["rank"] for d in (10, 13, 12)] == [2, 3, 4]
    with pytest.raises(ValueError):
        rrf_fuse([r1], k0=60)
    with pytest.raises(ValueError):
        rrf_fuse([r1, r2], k0=0)


def test_bm25_plan_shape(spark):
    """The candidate join must broadcast the query side and never
    shuffle the corpus for it (inverted-index access path)."""
    plan = bm25_topk(_docs(spark), _queries(spark), k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus participates in exactly the postings aggregation and
    # the (query, doc) score aggregation — no SortMergeJoin anywhere
    assert "SortMergeJoin" not in plan


def _plan_prefix(line):
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def test_bm25_one_shot_prunes_before_aggregating(spark):
    """Pin of the r12 plan restructure: in one-shot mode every
    CORPUS-token shuffle — an exchange keyed on both the doc id and
    `term` (the tf aggregation) — must sit ABOVE the broadcast
    query-term join, i.e. aggregate only query-pruned tokens. A
    regression to the corpus-wide (doc, term) postings shuffle would
    make that subtree broadcast-join-free. (Query-side term shuffles
    carry no doc id and are exempt.)

    Since the r12 optimization pass there must also be exactly ONE
    such exchange: df folds into the same pass as the candidate
    postings via a per-term count window, so the pre-r12 second
    evaluation of the postings lineage (a separate df
    pre-aggregation = one extra corpus scan + explode + pruned
    shuffle) must not reappear."""
    plan = bm25_topk(_docs(spark), _queries(spark), k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    checked = 0
    for i, line in enumerate(lines):
        if ("Exchange hashpartitioning" not in line or "term#" not in line
                or "doc_id#" not in line or "query_id#" in line):
            continue
        p = _plan_prefix(line)
        subtree = []
        for below in lines[i + 1:]:
            if _plan_prefix(below) <= p:
                break
            subtree.append(below)
        assert any("BroadcastHashJoin" in s for s in subtree), line
        checked += 1
    # exactly one corpus-token shuffle: the query-pruned tf aggregation
    assert checked == 1, plan


def test_query_by_example_on_testdata(spark, sf_dir):
    """Query-by-example over the real documents table. The synthetic
    corpus draws every doc from one small shared vocabulary, so BM25's
    length normalization can rank a shorter near-duplicate above the
    query's own document (that is correct Okapi behavior, verified
    when this test originally asserted rank-1-self and caught doc 3's
    near-dup 154 outscoring it). The sound invariants: every query
    fills k, ranks are dense, and the query's own document is always
    among the candidates with a positive score."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    qs = docs.where((F.col("doc_id") % 100 == 3) & (F.col("n_chars") > 0)) \
        .select(F.col("doc_id").alias("query_id"),
                F.col("text").alias("query_text"))
    n_q = qs.count()
    top = bm25_topk(docs, qs, k=10).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == n_q
    for rs in by_q.values():
        assert sorted(r["rank"] for r in rs) == list(range(1, 11))
    # with k = corpus size, the self doc must surface as a candidate
    full = bm25_topk(docs, qs, k=10_000)
    selfs = full.where(F.col("doc_id") == F.col("query_id")).collect()
    assert len(selfs) == n_q
    assert all(r["score"] > 0 for r in selfs)


# --- property pin: engine BM25 == independent pure-Python Okapi ---

from hypothesis import given, settings, strategies as st

_VOCAB = ["cat", "dog", "fish", "bird", "tree", "rock", "sun", "moon"]


@settings(max_examples=6, deadline=None, derandomize=True)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12),
        min_size=2, max_size=8),
    query=st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=4),
)
def test_bm25_matches_reference_impl(spark_global, docs, query):
    corpus = {i: " ".join(ts) for i, ts in enumerate(docs)}
    qtext = " ".join(query)
    sdf = spark_global.createDataFrame(
        list(corpus.items()), "doc_id long, text string")
    qdf = spark_global.createDataFrame(
        [(0, qtext)], "query_id long, query_text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(sdf, qdf, k=len(docs)).collect()}
    want = _ref_bm25(corpus, qtext)
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-6)
