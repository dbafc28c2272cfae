"""Distributed n-gram language model for perplexity filtering.

Engine extension (driver mandate: training-data pipeline operators).
CCNet-style corpus filtering ranks documents by the perplexity of a
language model trained on a clean reference corpus (KenLM 5-gram in
the original). This module is the honest in-engine equivalent: an
add-k–smoothed BIGRAM model as pure DataFrame algebra — no external
LM binary, no Python in the scoring path.

    P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁) + k·V)
    logprob(doc) = Σ_positions ln P(wᵢ|wᵢ₋₁) / n_positions
    perplexity(doc) = exp(−logprob)

Training is two aggregations over the reference corpus (bigram counts
and unigram context counts — zipfian, map-side combined). Scoring
joins the doc's bigrams against the count tables: unseen bigrams fall
back to the smoothed floor, unseen CONTEXTS to 1/V (the uniform
row). Tokens are lowercased whitespace words with sentence boundary
markers ``<s>``/``</s>`` per document.

At 100 TB: train on the (small, curated) reference; the model is two
count tables whose size tracks the reference's vocabulary, not the
corpus — broadcast them when they fit, shuffle-join on the bigram
otherwise (``broadcast_model=False``). Scoring the raw corpus is one
explode + join + doc-keyed aggregation. A bigram model is deliberate:
it captures the word-salad-vs-prose signal perplexity filtering needs
while keeping state joinable; the architecture extends to n>2 by
widening the gram key.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["BigramLM", "train_bigram_lm", "perplexity_score"]

BOS = "<s>"
EOS = "</s>"


@dataclass
class BigramLM:
    """``bigrams``: (w1, w2, c) counts; ``contexts``: (w1, c1)
    counts; ``vocab_size``: distinct w2 + 1 (the unseen token);
    ``k``: add-k smoothing constant."""

    bigrams: DataFrame
    contexts: DataFrame
    vocab_size: int
    k: float


def _doc_bigrams(text: Column) -> Column:
    """array<struct<w1,w2>> of bigrams over BOS + tokens + EOS.
    NULL/empty text yields [(BOS, EOS)] — the empty sentence."""
    toks = F.filter(
        F.split(F.lower(F.coalesce(text, F.lit(""))), " "),
        lambda t: t != "",
    )
    padded = F.concat(F.array(F.lit(BOS)), toks, F.array(F.lit(EOS)))
    return F.filter(
        F.zip_with(
            padded,
            F.slice(padded, 2, F.greatest(F.size(padded) - 1, F.lit(1))),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
        lambda s: s["w2"].isNotNull(),
    )


def train_bigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    k: float = 1.0,
) -> BigramLM:
    """Count bigrams and contexts over the reference corpus. Two
    aggregations; the count tables are the model."""
    if k <= 0:
        raise ValueError("k must be positive")
    grams = reference.select(
        F.explode(_doc_bigrams(F.col(text_col))).alias("g")
    ).select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    bigrams = grams.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    contexts = grams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = grams.select("w2").distinct().count() + 1  # + unseen token
    return BigramLM(bigrams=bigrams, contexts=contexts,
                    vocab_size=vocab, k=k)


def perplexity_score(
    df: DataFrame,
    model: BigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "perplexity",
    broadcast_model: bool = True,
) -> DataFrame:
    """``df`` plus ``perplexity`` (lower = more reference-like).

    One explode + two left joins against the count tables + one
    doc-keyed mean of ln P. Unseen bigram → smoothed k/(c1+kV);
    unseen context → uniform 1/V. ``broadcast_model=False`` lets the
    join shuffle when the reference vocabulary is too large to
    broadcast."""
    V = float(model.vocab_size)
    k = model.k
    bg = model.bigrams
    cx = model.contexts
    if broadcast_model:
        bg, cx = F.broadcast(bg), F.broadcast(cx)
    exploded = df.select(
        F.col(id_col),
        F.explode(_doc_bigrams(F.col(text_col))).alias("g"),
    ).select(
        F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    joined = (
        exploded.join(bg, ["w1", "w2"], "left")
        .join(cx, "w1", "left")
    )
    logp = F.when(
        F.col("c1").isNotNull(),
        F.log((F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(k))
              / (F.col("c1") + F.lit(k * V))),
    ).otherwise(F.lit(math.log(1.0 / V)))
    per_doc = (
        joined.groupBy(id_col)
        .agg(F.exp(-F.avg(logp)).alias(out_col))
    )
    return df.join(per_doc, id_col, "left")
