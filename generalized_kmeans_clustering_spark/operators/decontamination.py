"""Benchmark decontamination for training corpora.

Engine extension (LLM-data-pipeline mandate): before training, drop or
flag corpus documents that leak evaluation content. Two standard
methods:

- ``exact``: content-fingerprint anti-join (a corpus doc IS a
  benchmark doc byte-for-byte);
- ``ngram``: the GPT-3-style n-gram collision rule — a doc is
  contaminated when it shares at least ``min_collisions`` distinct
  word n-grams (default n=13) with any benchmark document.

Plan shape at 100 TB: the benchmark side is small (eval sets are
thousands of docs) — its distinct gram-hash set broadcasts; the corpus
side explodes to (doc, gram-hash) pairs, joins broadcast, and
aggregates collision counts per doc. One wide stage over the corpus,
no corpus shuffle except the final per-doc count (map-side combined on
doc id). Gram HASHES (xxhash64/md5 via the dedup hash) are compared,
not gram strings — 8 bytes a gram over the wire instead of ~100.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, shingles
from .dedup import _P, _hash64

__all__ = ["ngram_collisions", "decontaminate", "semantic_decontaminate"]


def ngram_collisions(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    n: int = 13,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, n_collisions) for corpus docs sharing ≥1 distinct word
    n-gram with the benchmark. Docs with zero collisions are absent.
    """
    btext = benchmark_text_col or text_col
    gram = lambda c: F.explode(F.array_distinct(F.transform(
        shingles(c, n), lambda s: F.abs(_hash64(s, hash_fn)) % _P)))
    bench_grams = (
        benchmark.select(gram(F.col(btext)).alias("_g")).distinct()
    )
    corpus_grams = corpus.select(F.col(id_col), gram(F.col(text_col)).alias("_g"))
    return (
        corpus_grams.join(F.broadcast(bench_grams), "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_collisions"))
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark_text_col: str | None = None,
    method: str = "ngram",  # "exact" | "ngram"
    n: int = 13,
    min_collisions: int = 1,
    mode: str = "flag",  # "flag" | "drop"
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Flag (or drop) benchmark-contaminated corpus documents.

    ``mode='flag'`` returns every row + ``is_contaminated`` (and
    ``n_collisions`` for the ngram method); ``mode='drop'`` keeps clean
    rows only. The exact method compares content fingerprints; the
    ngram method applies the ``min_collisions`` threshold on distinct
    shared n-grams.
    """
    if method not in ("exact", "ngram"):
        raise ValueError("method: 'exact' | 'ngram'")
    if mode not in ("flag", "drop"):
        raise ValueError("mode: 'flag' | 'drop'")
    btext = benchmark_text_col or text_col
    if method == "exact":
        bad_fp = benchmark.select(
            doc_fingerprint(F.col(btext)).alias("_fp")).distinct()
        out = (
            corpus.withColumn("_fp", doc_fingerprint(F.col(text_col)))
            .join(F.broadcast(bad_fp.withColumn("_hit", F.lit(True))),
                  "_fp", "left")
            .withColumn("is_contaminated",
                        F.coalesce(F.col("_hit"), F.lit(False)))
            .drop("_fp", "_hit")
        )
    else:
        hits = ngram_collisions(
            corpus, benchmark, text_col=text_col, id_col=id_col,
            benchmark_text_col=btext, n=n, hash_fn=hash_fn,
        ).where(F.col("n_collisions") >= min_collisions)
        out = (
            corpus.join(hits, id_col, "left")
            .withColumn("n_collisions",
                        F.coalesce(F.col("n_collisions"), F.lit(0)))
            .withColumn("is_contaminated",
                        F.col("n_collisions") >= min_collisions)
        )
    if mode == "drop":
        drop_cols = ["is_contaminated"] + (
            ["n_collisions"] if method == "ngram" else [])
        return out.where(~F.col("is_contaminated")).drop(*drop_cols)
    return out


def semantic_decontaminate(
    corpus_emb: DataFrame,
    benchmark_emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    benchmark_vec_col: str | None = None,
    mode: str = "flag",  # "flag" | "drop"
) -> DataFrame:
    """Embedding-space decontamination: flag (or drop) corpus rows
    whose cosine similarity to ANY benchmark row reaches
    ``threshold`` — catching paraphrased or reformatted eval leakage
    the exact/n-gram rules (:func:`decontaminate`) miss. Output in
    ``flag`` mode: every corpus row with ``max_benchmark_sim`` and
    ``contaminated``; ``drop`` mode keeps only clean rows (original
    columns).

    Plan shape at 100 TB: the benchmark side is small by definition
    (eval sets are thousands of vectors) — it BROADCASTS and the scan
    over the corpus computes a per-row running max in one map-side-
    combined aggregation keyed on the id; no corpus shuffle of vector
    data beyond that. For benchmark sets too large to broadcast, index
    them first (:func:`~.similarity.ivf_index`) and screen with
    :func:`~.similarity.ivf_topk` instead.
    """
    from ..functions.kernels import dot
    from .similarity import _as_double, _norm

    if mode not in ("flag", "drop"):
        raise ValueError("mode: flag | drop")
    bvec = benchmark_vec_col or vec_col
    bench = benchmark_emb.select(
        _as_double(F.col(bvec)).alias("_bv")).distinct() \
        .withColumn("_bnrm", _norm(F.col("_bv")))
    # corpus-side norm per row (once), not per (row × benchmark) pair;
    # dot/(_cnrm·_bnrm) is bit-identical to cosine_sim (same operands,
    # same multiplication order)
    scored = (
        corpus_emb.select(F.col(id_col),
                          _as_double(F.col(vec_col)).alias("_cv"))
        .withColumn("_cnrm", _norm(F.col("_cv")))
        .crossJoin(F.broadcast(bench))
        .withColumn("_sim", dot(F.col("_cv"), F.col("_bv"))
                    / (F.col("_cnrm") * F.col("_bnrm")))
        .groupBy(id_col)
        .agg(F.max("_sim").alias("max_benchmark_sim"))
        .withColumn("contaminated",
                    F.col("max_benchmark_sim") >= F.lit(float(threshold)))
    )
    flagged = corpus_emb.join(scored, id_col, "left").withColumn(
        "max_benchmark_sim",
        F.coalesce(F.col("max_benchmark_sim"), F.lit(float("-inf"))),
    ).withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False)))
    if mode == "drop":
        return flagged.where(~F.col("contaminated")) \
            .drop("max_benchmark_sim", "contaminated")
    return flagged
