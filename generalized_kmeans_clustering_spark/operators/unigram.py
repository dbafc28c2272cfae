"""Trained unigram-LM tokenizer: the SentencePiece-style EM sibling of
the BPE trainer (Kudo 2018, "Subword Regularization: Improving Neural
Network Translation Models with Multiple Subword Candidates").

Engine extension (driver mandate: large-scale training-data pipeline
operators). Where BPE (operators/tokenizer.py) learns a merge ORDER,
the unigram model learns a piece VOCABULARY with scores and segments
each word by Viterbi — the best-scoring split under the current piece
scores. This gives the budget/packing layer a second real trained
tokenizer with a different inductive bias (global best split vs greedy
local merges).

Distributed shape — the same discipline as ``train_bpe``:

- the corpus enters ONLY through word counts: one explode →
  groupBy(word) → count aggregation (map-side combined), kept as a
  DataFrame — never collected;
- the seed vocabulary is ONE more distributed aggregation (substring
  explode weighted by word count, capped by ``TakeOrdered`` at
  ``seed_size`` rows — bounded driver model state, like k-means
  centers);
- each EM round is ONE distributed aggregation: broadcast the current
  piece scores, Viterbi-segment the word table in an Arrow-batched
  ``mapInPandas``, and groupBy(piece) → sum(expected count). Driver
  state per round = the vocabulary (≤ seed_size rows). This is hard
  (Viterbi) EM — the standard deterministic variant; scores are
  re-estimated from the counts of pieces used on best paths.

Segmentation contract (shared with the SQL oracle twin): maximize
lexicographically ``(total piece score, -n_tokens)`` over all splits;
every single character is always a valid piece (score =
``pieces[ch]`` when trained, else ``unk_score``), so any word is
segmentable. With integer scores the objective is exactly
``max(1024*score - n_tokens)``, which is what the DuckDB recursive-CTE
twin computes — making the application path value-verifiable end to
end like the BPE replace-chain oracle.

Persistence uses the shared checksummed sidecar
(``sources/sidecar.py``), kind ``unigram_vocab``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "UnigramModel",
    "viterbi_segment",
    "train_unigram_lm",
    "unigram_token_count",
    "unigram_tokens",
    "unigram_doc_stats",
    "unigram_symbol_ids",
    "unigram_encode",
    "write_unigram_model",
    "read_unigram_model",
]


@dataclass
class UnigramModel:
    """Piece → score table (the entire model state) plus the score of
    an out-of-vocabulary single character. Scores are log-probs after
    training; any real-valued scores (e.g. the fixed integer table the
    oracle query uses) segment under the same contract."""

    pieces: dict = field(default_factory=dict)
    unk_score: float = 0.0

    @property
    def max_piece_len(self) -> int:
        return max((len(p) for p in self.pieces), default=1)


def viterbi_segment(word: str, pieces: dict, unk_score: float,
                    max_len: int):
    """Best split of ``word`` maximizing ``(sum of scores, -n_tokens)``
    lexicographically; single characters are always valid (score
    ``pieces.get(ch, unk_score)``). Returns (tokens, score, n_tokens).
    Remaining ties (same score AND count) resolve toward the shortest
    last piece — fully deterministic. Pure Python (no Spark) so tests
    and oracle replays can run it independently."""
    n = len(word)
    # dp[i] = (score, -ntok) best for prefix of length i, back[i] = k
    dp = [None] * (n + 1)
    back = [0] * (n + 1)
    dp[0] = (0.0, 0)
    for i in range(1, n + 1):
        best, bk = None, 0
        for k in range(1, min(max_len, i) + 1):
            prev = dp[i - k]
            if prev is None:
                continue
            piece = word[i - k:i]
            if k == 1:
                s = pieces.get(piece, unk_score)
            else:
                s = pieces.get(piece)
                if s is None:
                    continue
            cand = (prev[0] + s, prev[1] - 1)
            if best is None or cand > best:
                best, bk = cand, k
        dp[i], back[i] = best, bk
    toks = []
    i = n
    while i > 0:
        k = back[i]
        toks.append(word[i - k:i])
        i -= k
    toks.reverse()
    score, neg_ntok = dp[n] if n else (0.0, 0)
    return toks, score, -neg_ntok


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("c"))
    )


def train_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 512,
    seed_size: int = 2048,
    max_piece_len: int = 6,
    em_rounds: int = 2,
) -> UnigramModel:
    """Learn a unigram-LM piece vocabulary from a corpus.

    1. ONE word-count aggregation (the only full-corpus pass; the word
       table stays distributed and is reused by every round).
    2. Seed: one distributed substring-count aggregation — every
       substring of length 2..max_piece_len of every word, weighted by
       word count — capped at ``seed_size`` pieces by (count desc,
       piece asc) via TakeOrdered; single characters join with their
       own counts and are never pruned (coverage guarantee).
    3. ``em_rounds`` rounds of hard EM: broadcast scores → distributed
       Viterbi piece-count aggregation → driver M-step
       (score = log count/total). Zero-count multi-char pieces drop.
    4. Prune to ``vocab_size`` (all single chars + top multi-char
       pieces by expected count desc, piece asc), then one final EM
       round re-estimates scores for the pruned vocabulary.
    """
    words = _word_counts(df, text_col)
    words = words.persist()
    try:
        # --- seed: substring counts, bounded by TakeOrdered ---------
        # length >= 2 guard: for 1-char words sequence(1, length-1) is
        # sequence(1, 0) which Spark evaluates DESCENDING ([1, 0]),
        # fabricating the character itself as three phantom multi-char
        # substrings and triple-counting it into the seed (r12 advisor
        # find); single characters enter the vocabulary through their
        # own aggregation below, never through substrings.
        subs = words.where(F.length("w") >= 2).select(
            F.explode(F.expr(
                "flatten(transform(sequence(1, length(w) - 1), i -> "
                f"transform(sequence(2, least({int(max_piece_len)}, "
                "length(w) - i + 1)), l -> substring(w, i, l))))"
            )).alias("p"),
            F.col("c"),
        ).groupBy("p").agg(F.sum("c").alias("n"))
        top = subs.orderBy(F.desc("n"), F.asc("p")) \
            .limit(int(seed_size)).collect()
        chars = words.select(
            F.explode(F.split(F.col("w"), "")).alias("p"), F.col("c"),
        ).where(F.col("p") != "") \
            .groupBy("p").agg(F.sum("c").alias("n")).collect()
        counts = {r["p"]: float(r["n"]) for r in top}
        char_set = set()
        for r in chars:
            char_set.add(r["p"])
            counts[r["p"]] = counts.get(r["p"], 0.0) + float(r["n"])
        model = _m_step(counts, char_set)

        # --- hard-EM rounds ------------------------------------------
        for _ in range(int(em_rounds)):
            model = _m_step(_e_step(words, model), char_set)
        # --- prune to vocab_size, then re-estimate --------------------
        multi = sorted(
            ((p, c) for p, c in _e_step(words, model).items()
             if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:max(int(vocab_size) - len(char_set), 0)]
        kept = {p for p, _ in multi} | char_set
        model = UnigramModel(
            pieces={p: s for p, s in model.pieces.items() if p in kept},
            unk_score=model.unk_score)
        model = _m_step(_e_step(words, model), char_set)
        return model
    finally:
        words.unpersist()


def _e_step(words: DataFrame, model: UnigramModel) -> dict:
    """ONE distributed aggregation: Viterbi-segment the (word, count)
    table under the broadcast scores, emit (piece, count) usages,
    groupBy-sum, collect the bounded piece-count table."""
    pieces = dict(model.pieces)
    unk = float(model.unk_score)
    max_len = model.max_piece_len

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            acc: dict = {}
            for w, c in zip(pdf["w"], pdf["c"]):
                toks, _, _ = viterbi_segment(str(w), pieces, unk, max_len)
                for t in toks:
                    acc[t] = acc.get(t, 0) + int(c)
            yield pd.DataFrame(
                {"p": list(acc.keys()), "n": list(acc.values())})

    out = words.mapInPandas(_mapper, "p string, n bigint") \
        .groupBy("p").agg(F.sum("n").alias("n")).collect()
    return {r["p"]: float(r["n"]) for r in out}


def _m_step(counts: dict, char_set: set) -> UnigramModel:
    """Scores = log relative frequency; single characters keep a +1
    smoothing count so coverage never vanishes; zero-count multi-char
    pieces drop. The UNK score sits one nat below the rarest piece so
    unseen characters are always the worst (but valid) choice."""
    sm = {p: c + (1.0 if p in char_set else 0.0)
          for p, c in counts.items()
          if c > 0 or p in char_set}
    for ch in char_set:
        sm.setdefault(ch, 1.0)
    total = sum(sm.values())
    pieces = {p: math.log(c / total) for p, c in sm.items()}
    unk = (min(pieces.values()) if pieces else 0.0) - 1.0
    return UnigramModel(pieces=pieces, unk_score=unk)


def unigram_symbol_ids(model: UnigramModel) -> dict:
    """Deterministic piece → token-id table: single characters use
    their codepoint (no table needed, same scheme as ``bpe_symbol_ids``)
    and multi-char pieces get ``0x110000 + rank`` in lexicographic
    piece order — above the Unicode range, so the two id spaces never
    collide and the mapping is reproducible from the vocabulary alone."""
    return {p: 0x110000 + i
            for i, p in enumerate(sorted(p for p in model.pieces
                                         if len(p) > 1))}


def _apply(df: DataFrame, model: UnigramModel, text_col: str,
           out_cols: list):
    """Append per-row segmentation outputs via Arrow-batched
    ``mapInPandas`` with a per-batch word memo (the BPE application's
    plan-node-not-UDF rationale applies verbatim — see
    tokenizer._apply_map). ``out_cols`` ⊆ {n_tokens, score, tokens,
    token_ids}."""
    types = {"n_tokens": "bigint", "score": "double",
             "tokens": "array<string>", "token_ids": "array<bigint>"}
    clash = [c for c in out_cols if c in df.columns]
    if clash:
        raise ValueError(
            f"unigram apply: input already has column(s) {clash} — "
            "rename or drop them first (e.g. when comparing tokenizers, "
            "alias the BPE n_tokens before applying the unigram model)")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{c} {types[c]}" for c in out_cols]
    )
    pieces = dict(model.pieces)
    unk = float(model.unk_score)
    max_len = model.max_piece_len
    ids = unigram_symbol_ids(model) if "token_ids" in out_cols else None

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def one(t):
            if t is None:
                return None
            toks, score, ntok = [], 0.0, 0
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = viterbi_segment(w, pieces, unk, max_len)
                    memo[w] = got
                toks.extend(got[0])
                score += got[1]
                ntok += got[2]
            return toks, score, ntok

        for pdf in batches:
            pdf = pdf.copy()
            res = [one(t) for t in pdf[text_col]]
            if "n_tokens" in out_cols:
                pdf["n_tokens"] = [None if r is None else r[2]
                                   for r in res]
            if "score" in out_cols:
                pdf["score"] = [None if r is None else r[1] for r in res]
            if "tokens" in out_cols:
                pdf["tokens"] = [None if r is None else r[0] for r in res]
            if "token_ids" in out_cols:
                pdf["token_ids"] = [
                    None if r is None else
                    [ids[t] if len(t) > 1 else ord(t) for t in r[0]]
                    for r in res]
            yield pdf

    return df.mapInPandas(_mapper, out_schema)


def unigram_token_count(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
) -> DataFrame:
    """Per-row unigram-tokenizer token count (``n_tokens`` bigint) —
    the same drop-in ``n_tokens`` contract as ``bpe_token_count`` for
    the budget/packing layer. NULL text → NULL."""
    return _apply(df, model, text_col, ["n_tokens"])


def unigram_tokens(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
) -> DataFrame:
    """Per-row Viterbi piece sequence (``tokens array<string>``)."""
    return _apply(df, model, text_col, ["tokens"])


def unigram_doc_stats(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
) -> DataFrame:
    """Per-row (``n_tokens``, ``score``) in one pass — the
    oracle-verified application surface (the score pins the Viterbi
    objective itself, not just the token count)."""
    return _apply(df, model, text_col, ["n_tokens", "score"])


def unigram_encode(
    df: DataFrame,
    model: UnigramModel,
    text_col: str = "text",
) -> DataFrame:
    """Per-row token-ID sequence (``token_ids array<bigint>``) under
    the Viterbi segmentation and the :func:`unigram_symbol_ids` table —
    the same ``token_ids`` contract as ``bpe_encode``, so
    ``packing.materialize_packs_ids`` assembles TRAIN-READY packed ID
    sequences from either tokenizer unchanged. NULL text → NULL."""
    return _apply(df, model, text_col, ["token_ids"])


def write_unigram_model(spark, model: UnigramModel, path: str,
                        mode: str = "overwrite") -> None:
    """Persist the piece table through the shared checksummed sidecar."""
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(spark, path, "unigram_vocab", {
        "pieces": {str(p): float(s)
                   for p, s in sorted(model.pieces.items())},
        "unk_score": float(model.unk_score),
    }, mode=mode)


def read_unigram_model(spark, path: str) -> UnigramModel:
    """Load a :func:`write_unigram_model` sidecar."""
    from ..sources.sidecar import read_model_sidecar

    p = read_model_sidecar(spark, path, "unigram_vocab")
    return UnigramModel(pieces={k: float(v)
                                for k, v in p["pieces"].items()},
                        unk_score=float(p["unk_score"]))
