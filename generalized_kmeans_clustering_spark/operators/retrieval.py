"""Full-text retrieval: distributed BM25 top-k and reciprocal-rank
fusion.

Engine extension (driver mandate: similarity search / training-data
curation for LLM pipelines). The missing sibling of the embedding ANN
family (similarity.py / quantization.py): lexical search over the
``documents`` table, plus the standard hybrid-retrieval combiner that
merges a lexical and a semantic ranking into one list. Together with
``cosine_topk`` this gives the engine the classic hybrid-search stack
(BM25 + dense, fused with RRF) used for retrieval-augmented data
curation, dedup candidate mining, and eval-set construction.

All pure DataFrame ops — no UDFs, no driver-side loops:

- ``bm25_topk``: Okapi BM25 (Lucene-style non-negative idf,
  ``ln(1 + (N - df + 0.5)/(df + 0.5))``) with the usual k1/b length
  normalization. Plan shape (the 100 TB story):

  1. postings ``(doc, term, tf, dl)``. One-shot mode prunes the
     exploded token stream to the query vocabulary with a map-side
     broadcast join BEFORE aggregating, so every shuffle in the plan
     is bounded by the query terms' postings — a corpus-wide
     (doc, term) shuffle never happens. Document length rides along
     as a map-side expression grouped with the (functionally
     dependent) doc key — no second corpus aggregation, no
     corpus-with-corpus length join. Repeated-search mode
     materializes the full index once instead (``bm25_postings``,
     persisted bucketed by ``term``, sources/bucketing.py) and
     injects it via ``postings=`` — one corpus scan total.
  2. per-term document frequency for the QUERY terms only — a
     count(*) window partitioned by term, folded into the SAME pass
     as the candidate postings (postings rows are unique per
     (doc, term), so the count equals countDistinct(doc); pruning
     whole terms leaves df exact). The corpus-wide vocabulary is
     never aggregated, collected, or broadcast, and the postings
     lineage is evaluated ONCE (pre-r12 it was evaluated twice — a
     second corpus scan + explode + pruned shuffle just for df).
  3. candidate generation — postings ⋈ broadcast(query terms): a
     map-side hash join; the corpus never shuffles. Candidate volume
     is bounded by the postings of the query's terms (the classic
     inverted-index access path).
  4. per-(query, doc) score aggregation — shuffles only candidate
     rows keyed by (query_id, doc_id), map-side combined; then a
     per-query row_number window (Spark's WindowGroupLimit pushes
     the top-k head into the shuffle read).

  Corpus stats (N, avgdl) are computed as a 1-row aggregate and
  broadcast-cross-joined — no ``collect()``. Document length counts
  every non-empty whitespace token; zero-token documents participate
  in ``avgdl`` but can never match (no postings).

- ``rrf_fuse``: reciprocal-rank fusion (Cormack et al., SIGIR'09):
  ``score(d) = Σ_systems 1 / (k0 + rank_s(d))`` over any number of
  rankings. A union + one groupBy(query, doc) + one per-query window
  — rankings are already top-k-sized, so the fuse is tiny regardless
  of corpus scale.

Determinism contract (oracle twins): scores are rounded to
``score_decimals`` BEFORE ranking, and ties break on ascending doc
id, so Spark and DuckDB produce identical ranks even when the two
engines sum per-term contributions in different orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .similarity import _candidate_filter

__all__ = ["bm25_postings", "bm25_topk", "rrf_fuse"]


def _round6(col, decimals: int):
    # floor(x * 10^d + 0.5) / 10^d — the engine-wide half-up rounding
    # used by every oracle twin (DuckDB round() matches bitwise).
    scale = float(10 ** decimals)
    return F.floor(col * scale + F.lit(0.5)) / F.lit(scale)


def bm25_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index postings ``(id, term, tf, dl)`` in one corpus
    pass: document length rides along as a map-side expression grouped
    with the (functionally dependent) doc key, so this is exactly the
    single (doc, term)-keyed shuffle of ``term_counts``.

    This is the artifact to materialize at scale: write it once,
    bucketed by ``term`` (sources/bucketing.py), and pass it to
    ``bm25_topk(..., postings=...)`` — each search then reads the
    persisted table once (df folds into the same pass as the
    candidate postings) instead of re-exploding the corpus.
    """
    txt = F.col(text_col)
    dl_expr = F.coalesce(
        F.size(F.filter(F.split(txt, " "), lambda x: x != ""))
        .cast("double"),
        F.lit(0.0))
    return (
        docs.select(
            F.col(id_col),
            dl_expr.alias("dl"),
            F.explode(F.split(txt, " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    score_decimals: int | None = 6,
    postings: DataFrame | None = None,
    where=None,
) -> DataFrame:
    """Okapi BM25 top-k: ``(query_id, doc_id, score, rank)``.

    ``queries`` is a (small) DataFrame of ``(query_id, query_text)``;
    its distinct whitespace terms drive an inverted-index-shaped
    candidate join (each distinct query term contributes once —
    standard short-query BM25, query term frequency ignored). Scoring
    docs never leave their partitions until the final
    (query_id, doc_id) aggregation; see the module docstring for the
    full plan shape.

    ``score_decimals`` rounds scores half-up before ranking (ties →
    ascending doc id) so rankings are reproducible across engines;
    pass ``None`` to rank on raw double scores.

    ``postings`` optionally injects a pre-built (ideally persisted /
    term-bucketed) ``bm25_postings`` table so repeated searches skip
    the corpus explode entirely; corpus stats (N, avgdl) still come
    from ``docs`` because zero-token documents have no postings.
    Rows must be unique per (doc, term) — the :func:`bm25_postings`
    contract — since df is a per-term row count over them.

    ``where`` (Column or SQL string over DOC columns) PRE-filters the
    corpus — the engine-wide predicate-filter contract of the ANN
    family (similarity.py::_candidate_filter): the filter applies
    before scoring so every query still fills ``k``, it pushes down
    to the document scan, and BM25's collection statistics (N, avgdl,
    df) describe the filtered corpus, exactly as if the search ran
    over that sub-collection. Incompatible with an injected
    ``postings`` table (postings rows no longer carry the metadata
    columns the predicate needs) — pass one or the other.
    """
    if k <= 0:
        raise ValueError("bm25_topk: k must be > 0")
    if k1 < 0 or not 0 <= b <= 1:
        raise ValueError("bm25_topk: need k1 >= 0 and 0 <= b <= 1")
    if where is not None and postings is not None:
        raise ValueError(
            "bm25_topk: 'where' filters the document side and cannot "
            "be applied to a pre-built postings table — filter docs "
            "before bm25_postings, or drop one of the two arguments")
    docs = _candidate_filter(docs, where)

    txt = F.col(text_col)
    # Per-doc token count as a map-side expression. NULL text counts
    # as a zero-length document: present in N and avgdl (as 0), never
    # a match (explode of a NULL array emits nothing) — the DuckDB
    # twins apply the same coalesce.
    dl_expr = F.coalesce(
        F.size(F.filter(F.split(txt, " "), lambda x: x != ""))
        .cast("double"),
        F.lit(0.0))

    # 1-row corpus stats, broadcast-cross-joined (no collect()).
    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.avg(dl_expr).alias("_avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.split(F.col(query_text_col), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    qvocab = qterms.select("term").distinct()
    if postings is None:
        # One-shot path: prune the token stream to the query vocabulary
        # BEFORE any aggregation — the broadcast join is map-side, so
        # the (doc, term) tf aggregation shuffles only query-term
        # tokens and the corpus-wide (doc, term) shuffle of a full
        # postings build never happens. Pruning by term keeps df
        # exact: df(t) counts distinct docs containing t, and pruning
        # removes whole terms, not docs.
        pruned = (
            docs.select(
                F.col(id_col),
                dl_expr.alias("dl"),
                F.explode(F.split(txt, " ")).alias("term"),
            )
            .where(F.col("term") != "")
            .join(F.broadcast(qvocab), "term")
            .groupBy(id_col, "term", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    else:
        pruned = postings.join(F.broadcast(qvocab), "term")
    # Per-term df folded into the SAME pass as the candidate postings
    # (r12 optimization): postings rows are unique per (doc, term), so
    # a count(*) window partitioned by term over the pruned postings
    # equals countDistinct(doc) — the pre-r12 shape derived df with a
    # separate aggregation over a second evaluation of the postings
    # lineage, costing one extra corpus scan + explode + pruned
    # (doc, term) shuffle in one-shot mode (one extra read of the
    # postings table in injected mode). The window's exchange hashes
    # by term exactly like the old df aggregation did, so the skew
    # profile is unchanged; it adds only a within-partition sort of
    # the query-pruned candidate rows.
    pruned = pruned.withColumn(
        "_df",
        F.count(F.lit(1)).over(Window.partitionBy("term")).cast("double"))

    cand = (
        pruned.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5)))
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    contrib = idf * tf * F.lit(k1 + 1.0) / norm

    scores = (
        cand.groupBy("query_id", id_col)
        .agg(F.sum(contrib).alias("score"))
    )
    if score_decimals is not None:
        scores = scores.withColumn(
            "score", _round6(F.col("score"), score_decimals))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col))
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("doc_id"),
                "score", "rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    score_decimals: int | None = 6,
) -> DataFrame:
    """Reciprocal-rank fusion of ≥2 rankings into
    ``(query_id, doc_id, rrf, n_systems, rank)``.

    Each input carries ``(query_id, doc_id, rank)`` (extra columns
    ignored); a document absent from a system simply contributes
    nothing for it. ``rrf = Σ 1/(k0 + rank)`` with the conventional
    ``k0 = 60``; ``n_systems`` counts how many rankings surfaced the
    document (the standard hybrid-agreement diagnostic). Final order:
    (rrf desc, doc_id asc) after half-up rounding to
    ``score_decimals`` — see the module determinism contract.
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse: need at least two rankings")
    if k0 <= 0 or k <= 0:
        raise ValueError("rrf_fuse: need k0 > 0 and k > 0")
    parts = [
        r.select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k0))
                           + F.col(rank_col).cast("double"))).alias("_c"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = (
        unioned.groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("rrf"),
             F.count(F.lit(1)).cast("int").alias("n_systems"))
    )
    if score_decimals is not None:
        fused = fused.withColumn(
            "rrf", _round6(F.col("rrf"), score_decimals))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "rrf", "n_systems", "rank")
    )
