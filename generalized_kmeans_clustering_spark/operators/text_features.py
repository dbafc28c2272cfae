"""Distributed text feature extraction: term frequencies and TF-IDF.

Engine extension (driver mandate: text analysis for LLM-data
pipelines). Pure DataFrame ops:

- ``term_counts``: explode whitespace tokens → (doc, term, tf) — one
  shuffle keyed by (doc, term), map-side combined;
- ``tfidf``: joins per-term document frequency (broadcast when the
  vocabulary is small) and computes
  idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style) — deterministic
  integer-derived arithmetic, so the DuckDB oracle matches bitwise;
- ``top_terms_per_doc``: per-document top-k by (tfidf desc, term asc)
  window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["term_counts", "tfidf", "top_terms_per_doc", "top_ngrams",
           "top_collocations", "gopher_repetition_signals",
           "chunk_documents"]


def chunk_documents(
    df: DataFrame,
    size: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size overlapping character
    chunks — the standard retrieval/context-window shaping step.
    Output: ``(id, chunk_id, start, chunk, chunk_len)`` with 1-based
    ``start`` advancing by ``size - overlap``; the final chunk may be
    shorter. NULL or empty text yields no chunks (documented:
    filter-before-chunk is the pipeline contract).

    Scale: map-only — ``sequence`` + ``posexplode`` + ``substring``,
    all codegen expressions; output rows ≈ chars/(size-overlap) per
    doc with no shuffle, so the operator streams at scan speed and
    parallelism follows the input partitioning.
    """
    if overlap < 0 or size <= 0 or overlap >= size:
        raise ValueError("chunk_documents: need 0 <= overlap < size")
    step = size - overlap
    txt = F.col(text_col)
    # Start values 1, 1+step, ... <= len - overlap: every chunk adds at
    # least one char beyond the overlap (no fully-redundant tail chunk)
    # and the last chunk still reaches the end (s_last > len - size).
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.length(txt) - F.lit(overlap), F.lit(1)),
        F.lit(step))
    out = (
        df.where(txt.isNotNull() & (F.length(txt) > 0))
        .select(F.col(id_col), txt.alias("_txt"),
                F.posexplode(starts).alias("chunk_id", "start"))
        .select(
            id_col, "chunk_id", "start",
            F.substring(F.col("_txt"), F.col("start"), size).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk"))
    )
    return out


def term_counts(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf) for whitespace tokens (empty tokens dropped)."""
    toks = F.explode(F.split(F.col(text_col), " ")).alias("term")
    return (
        df.select(F.col(id_col), toks)
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(df: DataFrame, text_col: str = "text",
          id_col: str = "doc_id") -> DataFrame:
    """(id, term, tf, df, idf, tfidf) with smoothed idf."""
    n_docs = df.select(id_col).distinct().count()
    tc = term_counts(df, text_col, id_col)
    docfreq = tc.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1.0)) + 1.0
    return (
        tc.join(F.broadcast(docfreq), "term")
        .withColumn("idf", idf)
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
        .select(id_col, "term", "tf", "df", "idf", "tfidf")
    )


def top_ngrams(df: DataFrame, n: int = 2, k: int = 20,
               text_col: str = "text", id_col: str = "doc_id",
               min_count: int = 1) -> DataFrame:
    """Corpus-wide top-k n-grams: ``(ngram, n_docs, n_occurrences,
    rank)`` by (occurrences desc, ngram asc) — the corpus-analytics
    staple behind boilerplate discovery, contamination screening and
    tokenizer-vocabulary sanity checks.

    One explode + one groupBy(ngram): n-gram frequencies are zipfian,
    so the map-side partial aggregation collapses the head before the
    shuffle and the reduce side sees ~distinct-gram rows; the final
    top-k is a TakeOrdered (per-partition heads, no global sort
    materialization). Whitespace tokens, space-joined n-grams —
    the corpus convention shared with shingles/DSIR."""
    if n <= 0 or k <= 0:
        raise ValueError("n and k must be positive")
    # stage the token array as a bound column: HOF lambda bodies
    # re-evaluate their argument EXPRESSIONS per element, so slicing
    # an unbound split() inside transform() would re-split the text
    # O(len) times (the measured winnowing pitfall — see tests)
    staged = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: t != "").alias("_toks"),
    )
    toks = F.col("_toks")
    if n == 1:
        grams = toks
    else:
        grams = F.filter(
            F.transform(
                toks,
                lambda _, i: F.array_join(
                    F.slice(toks, i + 1, n), " "),
            ),
            # the last n-1 windows are short — drop by gram arity
            lambda g: F.size(F.split(g, " ")) == n,
        )
    exploded = staged.select(
        F.col(id_col), F.explode(grams).alias("ngram"))
    counts = (
        exploded.groupBy("ngram")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_occurrences") >= min_count)
    )
    return (
        counts.orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("n_occurrences"), F.asc("ngram"))),
        )
    )


def top_collocations(df: DataFrame, k: int = 20, min_count: int = 5,
                     text_col: str = "text",
                     id_col: str = "doc_id", pins=None) -> DataFrame:
    """Corpus-wide top-k collocations by pointwise mutual information:
    ``(w1, w2, n_pair, pmi, rank)`` ranked (pmi desc, w1 asc, w2 asc).

    PMI(w1, w2) = ln( p(w1 w2) / (p(w1)·p(w2)) ) with the pair
    probability over the bigram total and the word probabilities over
    the unigram total — the classic collocation / multi-word-
    expression detector (Church & Hanks 1990), and in a curation
    pipeline the gauge for tokenizer-merge candidates and templated
    boilerplate ("click here", "all rights reserved" score high).
    ``min_count`` suppresses the low-frequency PMI explosion (a pair
    seen once between two hapaxes maxes the statistic).

    Shape: one unigram agg + one bigram agg (both map-side combined,
    zipfian head collapses pre-shuffle), two keyed joins of the
    surviving (≥ min_count) bigrams against the unigram counts, totals
    as broadcast 1-row frames, TakeOrdered top-k. Work after the aggs
    is proportional to DISTINCT surviving bigrams, not corpus size.

    Both count frames are persisted: the unigram counts feed THREE
    branches (two joins + the unigram total) and the bigram counts two
    (the ≥ min_count survivors + the bigram total — an exact integer
    sum of the unfiltered counts, NOT a second corpus pass), so with
    lazy lineage one action re-tokenized the corpus five times; cached
    it is tokenized exactly twice — the floor. The cached frames are
    the aggregation outputs (distinct words / distinct bigrams —
    zipfian, orders smaller than the corpus). Pass a
    :class:`~.pins.Pins` to release them in a long-lived session."""
    if k <= 0 or min_count <= 0:
        raise ValueError("k and min_count must be positive")
    staged = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "),
                 lambda t: t != "").alias("_toks"),
    )
    toks = F.col("_toks")
    uni = (
        staged.select(F.explode(toks).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
        .persist()
    )
    if pins is not None:
        pins.add(uni)
    pairs = staged.select(
        F.explode(
            F.filter(
                F.transform(
                    toks,
                    # F.get is 0-based and NULL-safe past the end — the
                    # last token's dangling window filters out below
                    lambda _, i: F.struct(
                        F.get(toks, i).alias("w1"),
                        F.get(toks, i + 1).alias("w2"),
                    ),
                ),
                lambda s: s["w2"].isNotNull(),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bigc = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
        .persist()
    )
    if pins is not None:
        pins.add(bigc)
    big = bigc.where(F.col("n_pair") >= min_count)
    tot_uni = uni.agg(F.sum("n_w").alias("t1"))
    # row count of `pairs` == sum of its per-group counts: the same
    # integer read from the cached aggregate instead of a corpus pass
    tot_big = bigc.agg(F.sum("n_pair").alias("t2"))
    scored = (
        big.join(uni.select(F.col("w").alias("w1"),
                            F.col("n_w").alias("n_w1")), on="w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("n_w").alias("n_w2")), on="w2")
        .crossJoin(F.broadcast(tot_uni))
        .crossJoin(F.broadcast(tot_big))
        .select(
            "w1", "w2", "n_pair",
            F.log(
                (F.col("n_pair") / F.col("t2"))
                / ((F.col("n_w1") / F.col("t1"))
                   * (F.col("n_w2") / F.col("t1")))
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))),
        )
    )


def top_terms_per_doc(df: DataFrame, k: int = 5, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Top-k terms per document by tfidf (ties → lexicographic term)."""
    scored = tfidf(df, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def gopher_repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-document WITHIN-DOC repetition signals from the Gopher
    data-quality rules (Rae et al. 2021, arXiv:2112.11446 Table A1):

    - ``top_{n}gram_char_frac`` (n in ``top_ns``): characters of all
      occurrences of the document's single most frequent n-gram,
      divided by the document's characters. Flags "spammy" docs built
      around one repeated phrase (Gopher drops at > 0.20/0.18/0.16).
      Occurrence-count × gram-chars is the standard public
      computation; it can exceed 1 when the top gram overlaps itself
      ("spam spam spam …") — values that high are drop-worthy anyway.
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): characters covered
      by n-grams occurring MORE THAN ONCE in the document, divided by
      document characters — covered positions are counted once (union
      coverage), so the value is bounded by 1 even for pathological
      overlap (implementations differ here; union coverage is the
      deterministic, bounded choice). Gopher drops at > 0.15…0.10.

    Characters mean non-space token characters (numerator and
    denominator alike), so the fractions are separator-convention
    independent. Documents shorter than n tokens score 0 for that n;
    NULL/empty text scores 0 everywhere. Output: one row per input row
    with ``id_col`` and one column per signal — join back to the
    corpus and threshold per Gopher, or feed them to
    :func:`~.corpus.prepare_corpus` via its ``extra_rules`` plug-in.

    Scale shape: ONE explode over (n, start) windows, one map-side-
    combined groupBy on (doc, n, gram), one per-(doc, n) rollup, one
    conditional-aggregation pivot keyed on the doc — no collect, no
    window over the corpus; everything shuffles on the doc id.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    toks = F.split(F.col(text_col), " ")
    staged = df.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.array().cast("array<string>"))
        .otherwise(F.filter(toks, lambda t: t != "")).alias("_toks"),
    ).withColumn(
        "_tl", F.transform("_toks", lambda t: F.length(t))
    ).withColumn(
        "_chars",
        F.aggregate("_tl", F.lit(0), lambda a, x: a + x).cast("double"),
    )
    n_t = F.size("_toks")
    # one exploded pass over every (n, start) window
    windows = F.flatten(F.array(*[
        F.when(
            n_t >= n,
            F.transform(
                F.sequence(F.lit(1), n_t - n + 1),
                lambda s: F.struct(
                    F.lit(n).alias("n"), s.alias("s"),
                    F.md5(F.array_join(
                        F.slice("_toks", s, n), " ").cast("binary"))
                    .alias("gh"),
                    F.aggregate(F.slice("_tl", s, n), F.lit(0),
                                lambda a, x: a + x).alias("gchars"),
                ),
            ),
        ).otherwise(F.array().cast(
            "array<struct<n:int,s:int,gh:string,gchars:int>>"))
        for n in all_ns
    ]))
    grams = staged.select(
        id_col, "_chars", F.explode(windows).alias("_w")
    ).select(id_col, "_chars", "_w.n", "_w.s", "_w.gh", "_w.gchars")
    per_gram = grams.groupBy(id_col, "n", "gh").agg(
        F.count(F.lit(1)).alias("c"),
        F.first("gchars").alias("gchars"),
        F.collect_list("s").alias("starts"),
        F.first("_chars").alias("_chars"),
    )
    # per (doc, n): the top-gram char mass and the union coverage of
    # duplicated grams' starts
    per_n = per_gram.groupBy(id_col, "n").agg(
        F.max(F.col("c") * F.col("gchars")).alias("top_mass"),
        F.array_sort(F.flatten(F.collect_list(
            F.when(F.col("c") > 1, F.col("starts"))))).alias("dup_starts"),
        F.first("_chars").alias("_chars"),
    )
    # union coverage: token i is covered iff a duplicated gram starts
    # in (i-n, i]; charge its char length once. r12 optimization:
    # enumerate the covered positions FROM the duplicated starts
    # (sequence(s, s+n-1) per start, flattened + deduped) instead of
    # folding over every token position with an exists() scan of the
    # starts — O(dups·n) per (doc, n) instead of O(tokens·dups), and
    # exactly 0 work for the clean-doc common case (the old fold paid
    # O(tokens) per (doc, n) even when nothing was duplicated). Every
    # start s ≤ tokens−n+1, so s+n−1 never exceeds the token count,
    # and the sum is over the same integer token lengths counted once
    # — bit-identical dup_mass.
    cov = F.aggregate(
        F.array_distinct(F.flatten(F.transform(
            "_dup_starts",
            lambda s: F.sequence(s, s + F.col("_n") - 1)))),
        F.lit(0),
        lambda a, p: a + F.element_at("_tl", p),
    )
    per_n2 = per_n.join(
        staged.select(id_col, "_tl"), id_col
    ).select(
        id_col, "n", "top_mass", "_chars",
        F.col("dup_starts").alias("_dup_starts"),
        F.col("n").alias("_n"), "_tl",
    ).withColumn("dup_mass", cov.cast("double"))
    safe = F.when(F.col("_chars") > 0, F.col("_chars")).otherwise(F.lit(1.0))
    pivoted = per_n2.groupBy(id_col).agg(*(
        [F.coalesce(F.max(F.when(
            F.col("n") == n,
            F.col("top_mass") / safe)), F.lit(0.0))
         .alias(f"top_{n}gram_char_frac") for n in top_ns]
        + [F.coalesce(F.max(F.when(
            F.col("n") == n,
            F.col("dup_mass") / safe)), F.lit(0.0))
           .alias(f"dup_{n}gram_char_frac") for n in dup_ns]
    ))
    return df.select(id_col).join(pivoted, id_col, "left").select(
        id_col,
        *[F.coalesce(F.col(f"top_{n}gram_char_frac"), F.lit(0.0))
          .alias(f"top_{n}gram_char_frac") for n in top_ns],
        *[F.coalesce(F.col(f"dup_{n}gram_char_frac"), F.lit(0.0))
          .alias(f"dup_{n}gram_char_frac") for n in dup_ns],
    )
