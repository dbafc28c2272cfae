"""End-to-end corpus preparation for LLM training data.

Engine extension (driver mandate): composes the text-analysis and
deduplication operators into ONE declarative pipeline —

    signals (tokens / language / quality, pure expressions)
      → rule filters (length, language allow-list, quality floor)
      → dedup among survivors (exact fingerprint, or MinHash-LSH →
        verify → connected components → canonical selection)
      → keep flag + first-failing ``reject_reason`` per row

Everything except the optional near-dup stage is a single map-only
projection plus one shuffle (the dedup groupBy/window); the near-dup
stage reuses the LSH operators and stays bucket-joined. The output
keeps EVERY input row with its verdict, so corpus audits ("why was
this dropped?") are a filter, not a re-run — ``corpus_stats`` rolls
the verdicts up.

At 100 TB: signals and rules are expression-only (no shuffle); exact
dedup shuffles once on the 128-bit fingerprint; near-dup shuffles on
LSH band buckets. Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as Tx

__all__ = ["prepare_corpus", "corpus_stats", "source_rollup",
           "source_overlap"]

#: verdict precedence: the FIRST failing rule names the reason
_REASONS = ("too_short", "too_long", "language", "low_quality",
            "repetitive", "duplicate", "source_cap")


def prepare_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    languages=None,
    min_quality: float | None = None,
    max_repetition: float | None = None,
    redact_pii: bool = False,
    dedup: str | None = "exact",  # None | "exact" | "minhash" | "pairs"
    minhash_threshold: float = 0.8,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    dedup_pairs: DataFrame | None = None,
    dedup_lines_max_occurrences: int | None = None,
    line_sep: str = "\n",
    extra_rules=None,
    max_per_source: int | None = None,
    source_col: str = "source",
    cap_seed: int = 0,
    cap_hash_fn: str = "xxhash64",
    pins=None,
) -> DataFrame:
    """Annotate every document with signals + a keep/reject verdict.

    Output = input columns + ``n_tokens``, ``lang``, ``quality``,
    ``reject_reason`` (null when kept) and ``keep``. Duplicate
    resolution keeps the canonical row (exact: smallest id per
    fingerprint; minhash: longest text then smallest id per connected
    near-dup component) and only runs among rows that passed the
    content rules — a filtered-out row can't crowd out a good one.

    ``dedup_lines_max_occurrences`` (optional) first rewrites
    ``text_col`` through :func:`..dedup.drop_repeated_lines` — the
    C4/RefinedWeb boilerplate rule — so every downstream signal, rule
    and document-level dedup sees the cleaned text; the per-row
    ``n_lines_kept``/``n_lines_dropped`` audit columns ride through to
    the output.

    ``extra_rules`` (optional) is a list of ``(predicate_column,
    reason)`` pairs appended after the built-in rules (built-ins take
    precedence when several fire): the plug-in point for model-based
    signals computed upstream — e.g. a
    :func:`~.lm.perplexity_score` column
    (``(F.col("perplexity") > 1000, "high_perplexity")``) or a
    :func:`~.classifier.score_hashed_lr` quality-classifier column.
    Rejected rows count in the audit like any rule rejection.
    """
    if dedup not in (None, "exact", "minhash", "pairs"):
        raise ValueError("dedup: None | 'exact' | 'minhash' | 'pairs'")
    if dedup == "pairs" and dedup_pairs is None:
        raise ValueError("dedup='pairs' requires dedup_pairs (an (i, j) "
                         "edge list, e.g. embedding_near_dup_pairs or "
                         "simhash_near_dups output)")
    if dedup_lines_max_occurrences is not None:
        from .dedup import drop_repeated_lines

        docs = drop_repeated_lines(
            docs, text_col=text_col, line_sep=line_sep,
            max_occurrences=dedup_lines_max_occurrences)
    t = F.col(text_col)
    # Stage the per-language marker scores in their own projection, then
    # compute the argmax over plain column refs. Inlining the score
    # arithmetic per reference (~5 refs each in the argmax CASE) blows
    # the generated processNext() past janino's 64 KB method limit and
    # silently drops the whole signal stage out of whole-stage codegen —
    # the hot map stage of a 100 TB run would execute interpreted.
    # CollapseProject keeps the stage boundary because the staged
    # aliases are non-cheap and multiply referenced.
    score_cols = {lang: f"_ls_{lang}" for lang in Tx.LANG_MARKERS}
    scores = Tx.language_scores(t)
    out = docs.withColumn("n_tokens", Tx.token_count(t).cast("bigint")) \
              .withColumns({c: scores[lang] for lang, c in score_cols.items()})
    out = out.withColumn(
        "lang",
        Tx.language_id_from_scores(
            {lang: F.col(c) for lang, c in score_cols.items()}),
    ).drop(*score_cols.values())
    out = out.withColumn("quality", Tx.quality_score(t))
    if max_repetition is not None:
        out = out.withColumn("repetition", Tx.repetition_score(t))

    reason = F.lit(None).cast("string")
    rules = []
    if min_tokens is not None:
        rules.append((F.col("n_tokens") < min_tokens, "too_short"))
    if max_tokens is not None:
        rules.append((F.col("n_tokens") > max_tokens, "too_long"))
    if languages is not None:
        rules.append((~F.col("lang").isin(*languages), "language"))
    if min_quality is not None:
        rules.append((F.col("quality") < min_quality, "low_quality"))
    if max_repetition is not None:
        rules.append((F.col("repetition") > max_repetition, "repetitive"))
    if extra_rules:
        for pred, name in extra_rules:
            rules.append((pred, str(name)))
    for pred, name in reversed(rules):
        reason = F.when(pred, F.lit(name)).otherwise(reason)
    out = out.withColumn("reject_reason", reason)

    if dedup == "exact":
        # FILTER-FREE formulation. A where(reject_reason IS NULL)
        # before the fingerprint scan looks natural, but predicate
        # pushdown substitutes the whole signal forest (language
        # argmax, quality, token arithmetic) into one scan-level
        # Filter expression — ~1.4 MB of generated source that
        # overflows janino's 64 KB method limit, silently dropping
        # the hot map stage out of whole-stage codegen. Instead the
        # pass verdict rides as a COLUMN into a per-fingerprint
        # aggregate (map-side combined, one shuffle keyed on the
        # fingerprint); only groups with ≥2 passing rows survive,
        # so the join back is ≈ #duplicate-groups rows — AQE
        # broadcasts it at any scale where dups ≪ corpus.
        out = out.withColumn("_fp", Tx.doc_fingerprint(t))
        grp = (
            out.select("_fp", F.col(id_col).alias("_gid"),
                       F.col("reject_reason").isNull().alias("_pass"))
            .groupBy("_fp")
            .agg(F.min(F.when(F.col("_pass"), F.col("_gid")))
                 .alias("_keep_id"),
                 F.sum(F.col("_pass").cast("int")).alias("_npass"))
            .where(F.col("_npass") >= 2)
            .select(F.col("_fp").alias("_gfp"), "_keep_id")
        )
        # null-SAFE join key: groupBy puts all NULL-text rows (NULL
        # fingerprint) in one group, and they must dedup against each
        # other like any other identical-content group — a null-unsafe
        # equi-join would silently keep every NULL-text row
        out = out.join(
            grp, F.col("_fp").eqNullSafe(F.col("_gfp")), "left"
        ).drop("_gfp").withColumn(
            "reject_reason",
            F.when(F.col("reject_reason").isNull()
                   & F.col("_keep_id").isNotNull()
                   & (F.col(id_col) != F.col("_keep_id")),
                   F.lit("duplicate"))
            .otherwise(F.col("reject_reason")),
        ).drop("_fp", "_keep_id")
    elif dedup is not None:  # minhash | pairs
        from .dedup import (canonical_duplicates, duplicate_components,
                            jaccard_verify, lsh_candidate_pairs,
                            minhash_signatures)

        # Pushdown barrier: a plain where() here is substituted through
        # the signal projections into one scan-level Filter whose
        # generated code overflows janino's 64 KB method limit (see the
        # exact path comment; PushPredicateThroughNonJoin inlines alias
        # chains into the predicate with no size guard). Filters are
        # only held back by a NONDETERMINISTIC project field below
        # them, so the pass verdict is staged as a column tainted with
        # a vacuously-true nondeterministic term. Rows still drop
        # before any signature work.
        out2 = out.withColumn(
            "_pass",
            (F.monotonically_increasing_id() >= 0)
            & F.col("reject_reason").isNull())
        passed = out2.where(F.col("_pass")).drop("_pass")
        if dedup == "pairs":
            # caller-supplied near-dup evidence (embedding cosine,
            # SimHash, cross-run LSH, ...) — restrict to rows that
            # passed the content rules, same as the built-in modes
            pid = passed.select(F.col(id_col).alias("_pid"))
            verified = (
                dedup_pairs.join(pid, dedup_pairs["i"] == pid["_pid"])
                .drop("_pid")
                .join(pid, dedup_pairs["j"] == pid["_pid"])
                .drop("_pid")
            )
        else:
            sigs = minhash_signatures(
                passed, text_col=text_col, id_col=id_col,
                num_hashes=num_hashes, shingle_n=shingle_n,
                hash_fn=hash_fn)
            pairs = lsh_candidate_pairs(sigs, id_col=id_col,
                                        num_bands=num_bands,
                                        num_hashes=num_hashes)
            verified = jaccard_verify(passed, pairs, text_col=text_col,
                                      id_col=id_col, shingle_n=shingle_n,
                                      threshold=minhash_threshold,
                                      pins=pins)
        comp = duplicate_components(verified, pins=pins)
        marked = canonical_duplicates(
            passed.join(comp.select(F.col("id").alias(id_col)), id_col),
            comp, id_col=id_col, text_col=text_col)
        dup_ids = marked.where(~F.col("is_canonical")) \
                        .select(F.col(id_col).alias("_dup_id"))
        out = out.join(
            dup_ids, out[id_col] == dup_ids["_dup_id"], "left"
        ).withColumn(
            "reject_reason",
            F.when(F.col("reject_reason").isNull()
                   & F.col("_dup_id").isNotNull(), F.lit("duplicate"))
            .otherwise(F.col("reject_reason")),
        ).drop("_dup_id")
    if max_per_source is not None:
        # per-source cap (RefinedWeb per-domain rule) applied LAST so
        # docs rejected by content rules or dedup don't consume cap
        # slots. One window keyed on the source: passing rows sort
        # first (by the deterministic (hash, id) order of
        # sampling.cap_per_group), so a passing row's row_number
        # counts only passing rows ahead of it — no filter needed,
        # every row keeps its verdict.
        from pyspark.sql.window import Window

        from .sampling import hash_key

        if max_per_source <= 0:
            raise ValueError("max_per_source must be positive")
        wcap = Window.partitionBy(source_col).orderBy(
            F.col("reject_reason").isNull().desc(),
            hash_key(F.col(id_col), cap_seed, cap_hash_fn).asc(),
            F.col(id_col).asc(),
        )
        out = out.withColumn("_cap_rn", F.row_number().over(wcap)) \
            .withColumn(
                "reject_reason",
                F.when(F.col("reject_reason").isNull()
                       & (F.col("_cap_rn") > max_per_source),
                       F.lit("source_cap"))
                .otherwise(F.col("reject_reason")),
        ).drop("_cap_rn")
    out = out.withColumn("keep", F.col("reject_reason").isNull())
    if redact_pii:
        # redact AFTER dedup so fingerprints reflect original content
        out = out.withColumn(text_col, Tx.redact_pii(F.col(text_col)))
    return out


def corpus_stats(prepared: DataFrame) -> DataFrame:
    """Verdict rollup: one row per outcome (kept / each reject reason)
    with document and token counts — the audit table for a prep run."""
    return (
        prepared.groupBy(
            F.coalesce(F.col("reject_reason"), F.lit("kept")).alias("outcome"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").alias("n_tokens"))
    )


def source_rollup(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source curation dashboard:
    ``(source, n_docs, n_tokens, avg_quality, exact_dup_rate)`` — the
    domain-level view quality pipelines act on (blocklist a source,
    re-weight it in the mix, or investigate it) before touching
    per-document rules. ``exact_dup_rate`` is the fraction of the
    source's docs that are exact-content copies
    (1 − distinct fingerprints / docs). One map-side-combined groupBy
    on the source key; signals are pure expressions. NULL texts count
    as docs but contribute nothing to token/quality/dup sums (standard
    aggregate NULL semantics on both engines, so the oracle matches).
    """
    t = F.col(text_col)
    return (
        df.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(Tx.token_count(t)).cast("bigint").alias("n_tokens"),
            F.avg(Tx.quality_score(t)).alias("avg_quality"),
            (F.lit(1.0)
             - F.countDistinct(Tx.doc_fingerprint(t))
             / F.count(t)).alias("exact_dup_rate"),
        )
    )


def source_overlap(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    pins=None,
) -> DataFrame:
    """Cross-source content-overlap matrix:
    ``(source_a, source_b, n_shared, share_of_a, share_of_b)`` for
    every ordered-by-name source pair (a < b) that shares at least one
    exact content fingerprint — "how much of CommonCrawl is already in
    C4" as one query. ``share_of_x`` normalizes by the source's
    DISTINCT content count, so a source fully contained in another
    shows 1.0 regardless of raw duplication.

    Shape: one (fingerprint, source) distinct (map-side combined —
    within-source copies collapse before the shuffle), a self-join
    keyed on the fingerprint (per-key fan-out ≤ #sources², never
    corpus-sized), one groupBy on the source pair, and a broadcast
    join against the per-source distinct counts. NULL texts carry no
    fingerprint and drop from the matrix (standard join-key NULL
    semantics in both engines).

    The distinct (fingerprint, source) frame feeds FOUR branches (both
    self-join sides + the two per-source broadcast builds) and the
    per-source counts two — with lazy lineage one action fingerprinted
    the corpus four times. Both are persisted, so the corpus is
    fingerprinted exactly once per action; pass a
    :class:`~.pins.Pins` to release them in a long-lived session.
    """
    fps = (
        df.select(
            Tx.doc_fingerprint(F.col(text_col)).alias("_fp"),
            F.col(source_col).alias("_src"),
        )
        .where(F.col("_fp").isNotNull())
        .distinct()
        .persist()
    )
    per_source = fps.groupBy("_src").agg(
        F.count(F.lit(1)).alias("n_distinct")
    ).persist()
    if pins is not None:
        pins.add(fps)
        pins.add(per_source)
    a = fps.select("_fp", F.col("_src").alias("source_a"))
    b = fps.select("_fp", F.col("_src").alias("source_b"))
    shared = (
        a.join(b, on="_fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(per_source.select(
                F.col("_src").alias("source_a"),
                F.col("n_distinct").alias("_na"))),
            on="source_a",
        )
        .join(
            F.broadcast(per_source.select(
                F.col("_src").alias("source_b"),
                F.col("n_distinct").alias("_nb"))),
            on="source_b",
        )
        .select(
            "source_a", "source_b", "n_shared",
            (F.col("n_shared") / F.col("_na")).alias("share_of_a"),
            (F.col("n_shared") / F.col("_nb")).alias("share_of_b"),
        )
    )
