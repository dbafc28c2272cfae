"""DSIR — data selection via importance resampling (hashed n-grams).

Engine extension (driver mandate: training-data pipeline operators).
Implements the method of Xie et al., "Data Selection for Language
Models via Importance Resampling" (NeurIPS 2023): score every raw
document by how much more likely its hashed n-gram features are under
a TARGET corpus (the data you want more of) than under the RAW corpus
(the data you have), then resample proportionally.

Both corpora are reduced to B-bucket hashed bag-of-n-grams models:

    p̂[b] = (count_b + 1) / (N + B)          (Laplace smoothing)
    log w(doc) = Σ_grams (log p̂_target[bucket(g)]
                          − log p̂_raw[bucket(g)])

Everything is Catalyst expressions + two tiny aggregations:

- featurize: ``split(lower(text), ' ')`` unigrams + space-joined
  bigrams, each hashed to ``bucket = hash(gram|seed) % B`` — the
  engine's cross-engine hash (:func:`~.sampling.hash_key` semantics:
  xxhash64 production / md5 oracle-portable);
- bucket models: one explode + groupBy(bucket) per corpus — at most B
  rows each (B defaults to 4096), map-side combined;
- scoring: the B-row log-ratio table is BROADCAST back onto the
  exploded raw grams and summed per doc — one shuffle keyed on the
  doc id, no driver collect of any per-doc state;
- selection: Gumbel-top-m (``log w + Gumbel(hash(id, seed))``), the
  standard trick for sampling-without-replacement proportional to
  weights with a deterministic, partitioning-independent draw.

At 100 TB: the target corpus is small by construction (a quality
reference — Wikipedia, books, a hand-curated set); the raw side is
one scan + one doc-keyed shuffle. No all-pairs anything, no model
training. Compose with :func:`~.sampling.token_budget_sample` to turn
the selected set into a budgeted mix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _SCALE, _bucket, hash_key

__all__ = ["dsir_ngram_buckets", "dsir_bucket_model", "dsir_weights",
           "dsir_select"]


def dsir_ngram_buckets(
    text: Column,
    n_buckets: int = 4096,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> Column:
    """array<int> of hashed feature buckets: one entry per unigram and
    per space-joined bigram of the space-tokenized, lowercased text.
    NULL/empty text yields an empty array (the doc scores 0)."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), " "),
        lambda t: t != "",
    )
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        # zip_with pads the shorter side with NULL; concat_ws skips
        # NULLs, so the tail element degenerates to the bare unigram —
        # drop it by position instead: real bigrams contain a space
        lambda g: g.contains(" "),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            hash_key(g, seed, hash_fn), F.lit(n_buckets)).cast("int"),
    )


def dsir_bucket_model(
    df: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``(bucket, log_p)`` — the corpus's smoothed hashed-n-gram
    log-probabilities, exactly B rows (absent buckets get the smoothed
    floor ``log(1 / (N + B))``). One explode + one groupBy(bucket)."""
    spark = df.sparkSession
    counts = (
        df.select(F.explode(
            dsir_ngram_buckets(F.col(text_col), n_buckets, seed, hash_fn)
        ).alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c")).first()[0] or 0
    denom = float(total + n_buckets)
    domain = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    return (
        domain.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.log((F.coalesce(F.col("c"), F.lit(0)) + F.lit(1.0))
                  / F.lit(denom)).alias("log_p"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """``raw`` plus ``log_weight`` = Σ over the doc's hashed n-grams of
    ``log p̂_target[bucket] − log p̂_raw[bucket]``. Positive means the
    doc looks more like the target corpus than like the raw corpus.

    The two B-row bucket models are joined into one broadcast
    log-ratio table; scoring is explode → broadcast join → one
    groupBy(id) sum. Docs with no grams keep weight 0.0.
    """
    t_model = dsir_bucket_model(target, n_buckets, text_col, seed, hash_fn)
    r_model = dsir_bucket_model(raw, n_buckets, text_col, seed, hash_fn)
    ratio = (
        t_model.withColumnRenamed("log_p", "_lt")
        .join(r_model.withColumnRenamed("log_p", "_lr"), "bucket")
        .select("bucket", (F.col("_lt") - F.col("_lr")).alias("_lratio"))
    )
    per_doc = (
        raw.select(
            F.col(id_col),
            F.explode(
                dsir_ngram_buckets(F.col(text_col), n_buckets, seed, hash_fn)
            ).alias("bucket"),
        )
        .join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum("_lratio").alias(weight_col))
    )
    return (
        raw.join(per_doc, id_col, "left")
        .withColumn(weight_col, F.coalesce(F.col(weight_col), F.lit(0.0)))
    )


def dsir_select(
    weighted: DataFrame,
    m: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: int = 1,
    hash_fn: str = "xxhash64",
    key_col: str = "_gumbel_key",
) -> DataFrame:
    """Importance-resample ``m`` docs without replacement,
    probability ∝ exp(log_weight), via the Gumbel-top-m trick:
    ``key = log_weight − log(−log(u))`` with ``u`` a deterministic
    uniform from ``hash(id, seed)`` — reproducible on any partitioning
    or engine, unlike an RNG draw. Sorting-by-key + limit is Spark's
    TakeOrdered (per-partition top-m, then a merge of m-row heads —
    no global sort materialization)."""
    if m <= 0:
        raise ValueError("m must be positive")
    u = (_bucket(F.col(id_col), seed, hash_fn) + F.lit(0.5)) / F.lit(
        float(_SCALE))
    key = F.col(weight_col) - F.log(-F.log(u))
    return (
        weighted.withColumn(key_col, key)
        .orderBy(F.desc(key_col), F.asc(id_col))
        .limit(m)
    )
