"""Corpus drift audit: distribution shift between two corpus snapshots.

Engine extension (training-data pipeline telemetry). Every pipeline
decision upstream — new crawl, changed filters, a different sampling
temperature — shifts the token distribution the model will train on.
The drift audit quantifies the shift between two corpora (last
month's snapshot vs this month's, pre- vs post-filter, source A vs
source B) without collecting either:

- :func:`corpus_drift` — one row of global divergence gauges over the
  unigram distributions: Jensen–Shannon divergence and both KL
  directions (additively smoothed over the union vocabulary so KL is
  finite), total-variation distance on the raw shares, vocabulary
  Jaccard overlap, and the token/vocab totals.
- :func:`drift_top_terms` — the "what changed" report: top-k terms by
  absolute share difference, with per-corpus shares.

Distributed shape: tokenization is an explode; per-corpus counts are
ONE map-side-combined ``groupBy(token)`` each (zipfian head collapses
before the shuffle); the two count frames meet in ONE full-outer join
on the token; totals ride in as a broadcast 1-row frame; the gauges
are a final single aggregation. Nothing data-sized touches the
driver. For vocabularies beyond memory-per-key comfort, pass
``n_buckets`` to hash tokens into a bounded bucket space first (the
DSIR trick, ``operators/dsir.py``) — divergences over bucketed
distributions lower-bound the token-level values (data-processing
inequality) and the output stays ≤ n_buckets rows.

Smoothing: p̂(t) = (c_t + α) / (N + α·V) over the UNION vocabulary V,
so both smoothed distributions sum to exactly 1 and KL is defined
even where supports differ; α=0 recovers raw shares (KL then only
valid when supports match). JS/TV use the raw (unsmoothed) shares —
both are finite by construction, and reviewers expect TV on actuals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["token_counts", "corpus_drift", "drift_from_counts",
           "drift_top_terms"]


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int | None = None,
    seed: int = 7,
) -> DataFrame:
    """``(token, n)`` whitespace-unigram counts (the corpus convention
    shared with shingles/DSIR/top_ngrams). With ``n_buckets``, tokens
    are hash-bucketed (stringified bucket id) for a bounded result."""
    toks = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("token")
    )
    if n_buckets is not None:
        toks = toks.select(
            F.pmod(F.xxhash64("token", F.lit(seed)), F.lit(n_buckets))
            .cast("string")
            .alias("token")
        )
    return toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))


def _join_counts(ca: DataFrame, cb: DataFrame, pins=None) -> DataFrame:
    """Full-outer join of two ``(token, n)`` count frames with the
    token totals broadcast in — the shared back half of the batch
    operator and the streaming monitor.

    The totals ``ta``/``tb`` are aggregated from the two INPUT frames,
    not from the joined frame — so the full-outer join subtree appears
    exactly once in the consumer's lineage (aggregating the join and
    then cross-joining the result back onto it evaluated the join
    twice per action). The union-vocabulary size is NOT attached here:
    the only consumer that needs it (:func:`drift_from_counts`) counts
    it inside its single final aggregation.

    Each count frame is persisted: both feed TWO branches (its total +
    the join), and with lazy lineage the batch entry points re-derived
    each count aggregation — i.e. re-tokenized its corpus — twice per
    action. Cached, each corpus is tokenized exactly once. The cached
    frames are vocab-sized (token, n) aggregates; the streaming
    monitor's inputs are already parquet-backed, for which the cache
    is a no-cost second read. Pass a :class:`~.pins.Pins` to release
    them in a long-lived session."""
    ca = ca.persist()
    cb = cb.persist()
    if pins is not None:
        pins.add(ca)
        pins.add(cb)
    ta = ca.agg(F.sum("n").alias("ta"))
    tb = cb.agg(F.sum("n").alias("tb"))
    totals = ta.crossJoin(tb)
    ca = ca.withColumnRenamed("n", "na")
    cb = cb.withColumnRenamed("n", "nb")
    j = ca.join(cb, on="token", how="full_outer").select(
        "token",
        F.coalesce("na", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    return j.crossJoin(F.broadcast(totals))


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    n_buckets: int | None = None,
    seed: int = 7,
    pins=None,
) -> DataFrame:
    """One-row drift gauges between the unigram distributions of two
    corpora: ``(tokens_a, tokens_b, vocab_a, vocab_b, vocab_union,
    vocab_jaccard, js, kl_ab, kl_ba, tv)``. See module docstring for
    the smoothing and bucketing semantics."""
    return drift_from_counts(
        token_counts(df_a, text_col, n_buckets, seed),
        token_counts(df_b, text_col, n_buckets, seed),
        alpha=alpha, pins=pins,
    )


def drift_from_counts(
    counts_a: DataFrame, counts_b: DataFrame, alpha: float = 0.5,
    pins=None,
) -> DataFrame:
    """:func:`corpus_drift` from precomputed ``(token, n)`` count
    frames — the entry point for incremental/streaming monitors that
    maintain count stores instead of re-tokenizing corpora."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    j = _join_counts(counts_a, counts_b, pins=pins)
    p_raw = F.col("na") / F.col("ta")
    q_raw = F.col("nb") / F.col("tb")
    m = (p_raw + q_raw) / 2
    # raw-share JS: 0-count terms contribute 0 from their absent side
    js_terms = (
        F.when(F.col("na") > 0, 0.5 * p_raw * F.log(p_raw / m)).otherwise(0.0)
        + F.when(F.col("nb") > 0, 0.5 * q_raw * F.log(q_raw / m)).otherwise(0.0)
    )
    # Smoothed KL, decomposed so the union-vocab size v never has to
    # ride along per row (one aggregation pass, no totals pre-pass):
    # with p_t = (na_t+α)/D_a, q_t = (nb_t+α)/D_b, D_a = ta+αv,
    # D_b = tb+αv and Σ_t p_t = 1,
    #   KL(p‖q) = [Σ_t (na_t+α)·log((na_t+α)/(nb_t+α))]/D_a
    #             + log(D_b/D_a).
    # At α=0 a zero count makes its log term NULL (Spark log/÷0), which
    # sum() skips — identical to the old when(p>0, …).otherwise(0)
    # convention (docstring: α=0 KL only valid when supports match).
    na_s = F.col("na") + F.lit(alpha)
    nb_s = F.col("nb") + F.lit(alpha)
    agg = j.agg(
        F.max("ta").alias("ta"),
        F.max("tb").alias("tb"),
        F.sum((F.col("na") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("nb") > 0).cast("long")).alias("vocab_b"),
        F.count(F.lit(1)).alias("v"),
        F.sum(((F.col("na") > 0) & (F.col("nb") > 0)).cast("long"))
        .alias("vocab_both"),
        F.sum(js_terms).alias("js"),
        F.sum(na_s * F.log(na_s / nb_s)).alias("s_ab"),
        F.sum(nb_s * F.log(nb_s / na_s)).alias("s_ba"),
        (0.5 * F.sum(F.abs(p_raw - q_raw))).alias("tv"),
    )
    d_a = F.col("ta") + F.lit(alpha) * F.col("v")
    d_b = F.col("tb") + F.lit(alpha) * F.col("v")
    return agg.select(
        F.col("ta").alias("tokens_a"),
        F.col("tb").alias("tokens_b"),
        "vocab_a",
        "vocab_b",
        F.col("v").alias("vocab_union"),
        (F.col("vocab_both") / F.col("v")).alias("vocab_jaccard"),
        "js",
        (F.col("s_ab") / d_a + F.log(d_b / d_a)).alias("kl_ab"),
        (F.col("s_ba") / d_b + F.log(d_a / d_b)).alias("kl_ba"),
        "tv",
    )


def drift_top_terms(
    df_a: DataFrame,
    df_b: DataFrame,
    k: int = 20,
    text_col: str = "text",
    n_buckets: int | None = None,
    seed: int = 7,
    pins=None,
) -> DataFrame:
    """Top-k terms by absolute share difference —
    ``(token, share_a, share_b, delta, rank)``, ranked by |Δ| desc
    then token asc. The final top-k is a TakeOrdered over the joined
    count frame (per-partition heads, no global sort)."""
    if k <= 0:
        raise ValueError("k must be positive")
    j = _join_counts(
        token_counts(df_a, text_col, n_buckets, seed),
        token_counts(df_b, text_col, n_buckets, seed),
        pins=pins,
    )
    scored = j.select(
        "token",
        (F.col("na") / F.col("ta")).alias("share_a"),
        (F.col("nb") / F.col("tb")).alias("share_b"),
        (F.col("nb") / F.col("tb") - F.col("na") / F.col("ta")).alias(
            "delta"
        ),
    )
    return (
        scored.orderBy(F.abs(F.col("delta")).desc(), F.col("token"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.abs(F.col("delta")).desc(), F.col("token"))
            ),
        )
    )
