"""Scalable multi-pattern blocklist matching (C4-style badwords /
policy filters).

Engine extension (driver mandate: training-data curation). The C4 /
RefinedWeb pipelines drop or flag documents containing any of
thousands of blocked words and phrases. A naive ``rlike`` with a
giant alternation regex is a per-row scan whose cost grows with the
pattern count; this operator instead uses the engine's
inverted-index shape (the BM25 candidate join, retrieval.py): explode
the document into tokens / token n-grams ONCE and hash-join them
against the broadcast pattern list — per-doc cost is independent of
how many patterns the blocklist holds.

Plan shape (100 TB story):

1. patterns — a driver-side list (blocklists are KBs, not GBs) split
   into single-token words and multi-token phrases; each group is
   broadcast.
2. token explode — one map-side ``explode``; single-token matches are
   a BroadcastHashJoin, then one groupBy(doc) hit aggregation.
3. phrases — for each distinct phrase length n, the document's
   token n-grams are built map-side (``transform`` over a token-array
   column, HOF-staged per the engine's re-evaluation rule) and joined
   the same way. Phrase lengths are bounded by the blocklist, not the
   corpus.
4. output — per-doc ``(id, n_hits, n_distinct_patterns,
   matched_patterns)`` ready to join back (broadcast-sized when hits
   are rare) or to feed ``prepare_corpus(extra_rules=...)``.

Matching is exact on whitespace tokens after optional lowercasing —
deterministic and engine-portable (DuckDB twin planned: same explode
+ join in SQL), unlike locale-dependent regex word boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocklist_hits", "blocklist_rule"]


def _tokens(text, lowercase: bool):
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, " "), lambda x: x != "")


def blocklist_hits(
    df: DataFrame,
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Per-document blocklist matches: ``(id, n_hits,
    n_distinct_patterns, matched_patterns)``.

    ``patterns`` mixes single words and multi-word phrases (matched
    as exact token n-grams). Documents with zero hits are absent —
    join back with a left join and coalesce to 0, or use
    ``blocklist_rule`` for the prepare_corpus integration.
    ``n_hits`` counts occurrences (a word appearing 3 times counts
    3); ``matched_patterns`` is the sorted distinct pattern list.
    """
    if not patterns:
        raise ValueError("blocklist_hits: patterns must be non-empty")
    norm = [(" ".join(p.split()).lower() if lowercase
             else " ".join(p.split())) for p in patterns]
    norm = sorted({p for p in norm if p})
    if not norm:
        raise ValueError("blocklist_hits: no non-empty patterns")
    spark = df.sparkSession
    by_len: dict[int, list[str]] = {}
    for p in norm:
        by_len.setdefault(len(p.split(" ")), []).append(p)

    toks = df.select(
        F.col(id_col),
        _tokens(F.col(text_col), lowercase).alias("_toks"))
    parts = []
    for n, pats in sorted(by_len.items()):
        pdf = F.broadcast(spark.createDataFrame(
            [(p,) for p in pats], "pattern string"))
        if n == 1:
            grams = toks.select(
                id_col, F.explode("_toks").alias("pattern"))
        else:
            # n-grams staged map-side. The where(size >= n) guard is
            # LOAD-BEARING: below n tokens, sequence(1, size-n+1)
            # descends through 0 and slice(start=0) throws — the guard
            # is what keeps short documents out of this branch.
            grams = toks.where(F.size("_toks") >= n).select(
                id_col,
                F.explode(F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
                    lambda i: F.array_join(
                        F.slice(F.col("_toks"), i, n), " "),
                )).alias("pattern"))
        parts.append(grams.join(pdf, "pattern"))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
             F.countDistinct("pattern").cast("long")
             .alias("n_distinct_patterns"),
             F.array_sort(F.collect_set("pattern"))
             .alias("matched_patterns"))
    )


def blocklist_rule(
    df: DataFrame,
    patterns: list[str],
    max_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
):
    """``(predicate_column, reason)`` pair for
    ``prepare_corpus(extra_rules=...)``: flags documents whose
    blocklist hit count EXCEEDS ``max_hits`` (0 = any hit blocks).

    Returns ``(df_with_hits, rule)`` where ``df_with_hits`` is ``df``
    left-joined with per-doc hit counts (``n_blocklist_hits``, 0 for
    clean docs) — pass that frame to prepare_corpus so the predicate
    column resolves.
    """
    if "n_blocklist_hits" in df.columns:
        raise ValueError(
            "blocklist_rule: input already has an n_blocklist_hits "
            "column (e.g. from a previous blocklist_rule call) — "
            "rename it first, or merge the pattern lists into one "
            "call; chaining would silently make both rule predicates "
            "read the same column")
    hits = blocklist_hits(df, patterns, text_col, id_col, lowercase) \
        .select(id_col, F.col("n_hits").alias("n_blocklist_hits"))
    out = df.join(hits, id_col, "left").withColumn(
        "n_blocklist_hits",
        F.coalesce(F.col("n_blocklist_hits"), F.lit(0)))
    rule = (F.col("n_blocklist_hits") > max_hits, "blocklisted")
    return out, rule
