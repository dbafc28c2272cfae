"""Text-analysis column functions for large-scale document pipelines.

These are engine extensions beyond the reference's surface (driver
mandate: LLM-data-pipeline operators), built as pure Catalyst
expressions so they scale map-only to any data size.

Determinism note: token counting uses space-arithmetic
(len(text) − len(text without spaces) + 1) rather than regex splits so
the same value is reproducible in any SQL engine (the DuckDB oracle
uses the identical formula).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "char_count",
    "avg_token_len",
    "punct_ratio",
    "digit_ratio",
    "quality_score",
    "doc_fingerprint",
    "shingles",
    "token_count_regex",
    "language_scores",
    "language_id",
    "language_id_from_scores",
    "normalize_text",
    "normalized_fingerprint",
    "min_shingle_fingerprint",
    "char_gram_hashes",
    "winnow_from_grams",
    "winnow_fingerprints",
    "LANG_MARKERS",
    "redact_pii", "pii_counts", "repetition_score",
]

#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation.
#: Identical semantics in Java regex (Spark) and RE2-ish (DuckDB) for
#: this simple alternation, so it is oracle-portable.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: Marker words per language for the n-gram language-ID heuristic.
#: Scores are substring-occurrence counts of space-padded markers —
#: pure length arithmetic, so the DuckDB oracle can run the identical
#: expression. Order matters: ties resolve to the earlier language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "und", "die", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}


def char_count(text: Column) -> Column:
    return F.length(text)


def token_count(text: Column) -> Column:
    """Whitespace token count via space arithmetic (single-space corpora);
    exact and engine-portable."""
    return F.length(text) - F.length(F.translate(text, " ", "")) + F.lit(1)


def avg_token_len(text: Column) -> Column:
    nospace = F.length(F.translate(text, " ", ""))
    return nospace * 1.0 / token_count(text)


def punct_ratio(text: Column) -> Column:
    stripped = F.length(F.translate(text, ".,;:!?'\"()-", ""))
    return (F.length(text) - stripped) * 1.0 / F.greatest(F.length(text), F.lit(1))


def digit_ratio(text: Column) -> Column:
    stripped = F.length(F.translate(text, "0123456789", ""))
    return (F.length(text) - stripped) * 1.0 / F.greatest(F.length(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: penalize very short docs, high punct and
    digit density. Deliberately simple, monotone, and SQL-portable."""
    length_term = F.least(F.length(text) * 1.0 / 500.0, F.lit(1.0))
    return length_term * (1.0 - punct_ratio(text)) * (1.0 - digit_ratio(text))


def normalize_text(text: Column) -> Column:
    """Canonical text form for normalization-invariant dedup: lowercase,
    strip everything but letters/digits/whitespace, collapse whitespace
    runs to one space, trim. Catches the trivial variants exact
    fingerprints miss (case flips, punctuation-only edits, reflowed
    whitespace) while staying a pure expression. The character classes
    are Unicode (``\\p{L}``/``\\p{N}``) and mean the same thing in
    Java regex (Spark) and RE2 (DuckDB), so normalized fingerprints
    stay engine-portable."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, r"[^\p{L}\p{N}\s]", "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def normalized_fingerprint(text: Column) -> Column:
    """md5 of :func:`normalize_text` — the dedup key for
    normalization-invariant exact dedup (pair with
    ``operators.dedup.exact_dup_groups`` on a pre-normalized column,
    or ``operators.incremental`` stores)."""
    return F.md5(normalize_text(text).cast("binary"))


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (hex md5) for exact
    dedup and stable doc identity."""
    return F.md5(text.cast("binary"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram (shingle) array for Jaccard/MinHash dedup.

    ``transform`` over the token index range keeps it JVM-side.
    NOTE: when the result feeds several downstream expressions,
    materialize it (or its hash array) in its own ``withColumn`` first —
    expression trees are inlined per use, so a shared reference avoids
    recomputing the split/slice work.
    """
    toks = F.split(text, " ")
    return shingles_from_tokens(toks, n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    cnt = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.when(cnt >= n, F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )).otherwise(F.array(F.array_join(toks, " ")))


def token_count_regex(text: Column) -> Column:
    """BPE-ish token count: letter runs + digit runs + punctuation marks."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def _occurrences(padded: Column, word: str) -> Column:
    """Non-overlapping occurrences of ' word ' via length arithmetic."""
    marker = f" {word} "
    return (
        F.length(padded) - F.length(F.replace(padded, F.lit(marker)))
    ) / len(marker)


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-occurrence scores (expression-only)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(
            (_occurrences(padded, w) for w in words), start=F.lit(0.0)
        )
        for lang, words in LANG_MARKERS.items()
    }


def language_id_from_scores(scores: dict[str, Column]) -> Column:
    """Argmax language code from PRE-STAGED score columns.

    First-match-wins CASE against the max score, so ties resolve to the
    earlier entry in the dict (stable, oracle-portable). Pass bound
    columns (their own ``withColumn``) when composing with other signal
    expressions: each score is referenced ~5× here, and inlining the
    full marker-arithmetic tree per reference is what pushed the
    single-projection corpus pipeline past janino's 64 KB method limit
    (whole-stage codegen then silently falls back to interpreted).
    """
    mx = F.greatest(*scores.values())
    expr = None
    for lang in scores:
        cond = (scores[lang] == mx) & (mx > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None \
            else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))


def language_id(text: Column) -> Column:
    """Argmax language code, 'unknown' when no marker matches.

    Single-expression form, written reference-efficiently: each
    language's score expression appears exactly ONCE, inside an
    ``array_max`` over ``struct(score, -order, lang)`` (struct ordering
    is lexicographic → highest score wins, ties → lowest order = the
    earlier ``LANG_MARKERS`` entry, matching
    :func:`language_id_from_scores`). The naive greatest/CASE argmax
    re-references every score ~5×, and since Catalyst inlines
    expression trees per reference, that blows up generated code in any
    context where the scores cannot be staged as columns (e.g. a filter
    predicate this expression gets pushed into). For wide signal
    projections prefer staging :func:`language_scores` +
    :func:`language_id_from_scores`.
    """
    scores = language_scores(text)
    entries = [
        F.struct(score.alias("s"), F.lit(-i).alias("no"),
                 F.lit(lang).alias("lang"))
        for i, (lang, score) in enumerate(scores.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("unknown"))


#: polynomial rolling-hash parameters (fit in int64: P·B + 255 < 2^63)
_RH_BASE = 257
_RH_MOD = 1_000_003


def char_gram_hashes(text: Column, k: int = 8) -> Column:
    """Polynomial hashes of all char k-grams:
    h = fold(chars, (acc, ch) → (acc·B + code(ch)) mod P).

    Pure integer arithmetic, identical in any engine (the DuckDB
    oracle runs the same fold via ``list_reduce``).
    """
    n_grams = F.greatest(F.length(text) - k + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.aggregate(
            F.sequence(F.lit(1), F.lit(k)),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * _RH_BASE
                            + F.ascii(F.substr(text, i + j, F.lit(1))))
            % _RH_MOD,
        ),
    )


def winnow_from_grams(grams: Column, w: int = 4) -> Column:
    """Distinct window-minima fingerprints from a PRE-STAGED gram-hash
    column. ``grams`` must be a bound column (own ``withColumn``), not
    an inline expression — lambda bodies re-evaluate their argument
    expressions per element, which would turn the O(L) windowing into
    O(L²·k)."""
    n_windows = F.greatest(F.size(grams) - w + 1, F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda t: F.array_min(F.slice(grams, t, w)),
    )
    return F.array_sort(F.array_distinct(mins))


def winnow_fingerprints(df, text_col: str = "text", k: int = 8, w: int = 4,
                        out_col: str = "fingerprints"):
    """Winnowing (Schleimer et al. 2003) document fingerprints: the
    distinct minima of every ``w``-window of char ``k``-gram rolling
    hashes — sorted array<long>, robust to local edits.

    DataFrame-level so the gram array can be staged in its own
    projection (see :func:`winnow_from_grams`)."""
    staged = df.withColumn("_wg", char_gram_hashes(F.col(text_col), k))
    return staged.withColumn(
        out_col, winnow_from_grams(F.col("_wg"), w)
    ).drop("_wg")


def min_shingle_fingerprint(text: Column, n: int = 3) -> Column:
    """Smallest md5 over the word n-gram shingles — a deterministic,
    engine-portable 1-hash MinHash (winnowing-style doc fingerprint)."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


#: PII patterns (conservative, high-precision): emails, 13-19-digit
#: card-like runs, IPv4 addresses, phone-ish sequences. REDACTION
#: ORDER MATTERS: email first (its digits must not half-match phone),
#: card and IP before phone (the looser phone pattern would otherwise
#: eat their digit runs).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("card", r"\b\d{13,19}\b", "<CARD>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,3}[\s.-]?\(?\d{3}\)?[\s.-]?\d{3}[\s.-]?\d{4}",
     "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Replace common PII with typed placeholders — expression-only
    chain of ``regexp_replace`` (order matters: emails before phones so
    digits in addresses don't half-match). High precision by design;
    recall tuning belongs to a model-based pass outside this engine."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> Column:
    """struct of per-type PII match counts (same patterns as
    :func:`redact_pii`) for corpus auditing."""
    return F.struct(*[
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(name)
        for name, pat, _ in PII_PATTERNS
    ])


def repetition_score(text: Column, n: int = 3) -> Column:
    """Gopher-style within-document repetition: 1 − distinct/total word
    n-grams. 0 = no repeated n-gram; → 1 as the doc degenerates into
    loops. Expression-only (shingle array staged once)."""
    grams = shingles(text, n)
    total = F.size(grams)
    return (1.0 - F.size(F.array_distinct(grams))
            / F.greatest(total.cast("double"), F.lit(1.0)))
