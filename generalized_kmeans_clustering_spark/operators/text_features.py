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

__all__ = ["term_counts", "tfidf", "top_terms_per_doc", "top_ngrams"]


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
