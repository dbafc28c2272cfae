"""Trained byte-pair-encoding tokenizer: corpus-side learning,
Arrow-batched application, real token counts for the budget/packing
layer.

Engine extension (driver mandate: large-scale training-data pipeline
operators). Every budget and packing number in the curation layer
(``token_budget_sample``, ``pack_concat``, shard manifests) previously
meant "whitespace tokens", which diverges from real trained-tokenizer
tokens by 1.3–1.5×. This module provides an in-engine BPE (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units") so those numbers can mean actual model tokens:

- :func:`train_bpe` — the heavy, corpus-scale step is ONE distributed
  word-count aggregation (explode → groupBy(word) → count, map-side
  combined); merge learning then runs on the bounded word-frequency
  table driver-side, which is how reference BPE trainers operate too —
  the training corpus enters only through word counts. The table is
  capped at ``max_words`` rows (taken by count desc, word asc —
  deterministic), so driver state is bounded model state, never data.
- :func:`bpe_token_count` / :func:`bpe_tokens` — application over the
  corpus as an Arrow-batched ``mapInPandas`` with a per-word memo (natural
  corpora repeat words heavily, so the memo hit rate is the word
  frequency distribution itself). Merges apply in learned order, each
  exhaustively left-to-right; because a merge's output symbol can only
  appear in pairs learned LATER, sequential order-exhaustive
  application is exactly priority-based BPE application (and exactly a
  chain of non-overlapping string replaces — which is what makes the
  DuckDB oracle twin expressible).

No end-of-word marker is used: merges never cross word boundaries
either way, and the marker only matters for detokenization, which this
engine does not do. Words are whitespace-separated (the corpus
convention throughout the curation layer).

Persistence uses the shared checksummed sidecar
(``sources/sidecar.py``), kind ``bpe_merges``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BPEModel",
    "train_bpe",
    "bpe_token_count",
    "bpe_tokens",
    "bpe_encode",
    "bpe_symbol_ids",
    "write_bpe_model",
    "read_bpe_model",
    "learn_merges_from_counts",
]


@dataclass
class BPEModel:
    """Ordered merge list (the entire model state: applying merges in
    order reproduces the segmentation)."""

    merges: list = field(default_factory=list)

    @property
    def vocab(self) -> set:
        """Merge-produced symbols (single characters are implicit)."""
        return {a + b for a, b in self.merges}


def _segment(word: str, merges) -> list:
    """Apply merges in learned order, each exhaustively left-to-right
    over the symbol list — equivalent to priority-based application
    (see module docstring) and to a chain of string replaces."""
    syms = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def learn_merges_from_counts(word_counts, num_merges: int) -> list:
    """Classic BPE merge learning over a ``[(word, count), ...]``
    table: repeatedly merge the most frequent adjacent symbol pair.
    Ties break on the lexicographically smallest pair — fully
    deterministic for a deterministic count table. Pure Python (no
    Spark) so an oracle twin can replay it independently."""
    words = [(list(w), int(c)) for w, c in word_counts if w]
    merges = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt = []
        for syms, c in words:
            if len(syms) >= 2:
                out = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            nxt.append((syms, c))
        words = nxt
    return [list(m) for m in merges]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 65536,
) -> BPEModel:
    """Learn BPE merges from a corpus.

    Distributed part: ONE word-count aggregation (explode words →
    groupBy → count, map-side combined — the only pass over the data).
    The frequency table is capped at ``max_words`` distinct words by
    (count desc, word asc) via ``TakeOrdered`` — at web scale the head
    of the word distribution carries virtually all pair mass, so the
    cap trades an unbounded driver collect for a documented, tiny
    approximation (reference BPE trainers cap their word tables the
    same way). Merge learning on the bounded table is driver-side
    model fitting, like collecting k-means centers."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count("*").alias("c"))
    )
    top = counts.orderBy(F.desc("c"), F.asc("w")).limit(max_words).collect()
    return BPEModel(
        merges=learn_merges_from_counts(
            [(r["w"], r["c"]) for r in top], num_merges))


def _apply_map(df: DataFrame, model: BPEModel, text_col: str,
               out_col: str, out_type: str, per_word):
    """Append ``out_col`` by applying the merges per word with a
    batch-lifetime memo. Implemented as ``mapInPandas`` — a PLAN NODE,
    not a UDF expression — deliberately: a ``pandas_udf`` whose input
    column is itself a non-codegen higher-order-function expression
    (e.g. text rewritten by :func:`~.dedup.drop_repeated_spans`) can
    be left inside an interpreted projection by
    ``ExtractPythonUDFs`` under AQE and fail with
    "Cannot evaluate expression: PythonUDF" at run time; the map node
    has no such extraction step."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {out_type}"]
    )
    merges = [tuple(m) for m in model.merges]

    def _mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}

        def one(t):
            if t is None:
                return None
            acc = per_word.start()
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = _segment(w, merges)
                    memo[w] = got
                acc = per_word.step(acc, got)
            return acc

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [one(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(_mapper, out_schema)


class _Count:
    start = staticmethod(lambda: 0)
    step = staticmethod(lambda acc, syms: acc + len(syms))


class _Toks:
    start = staticmethod(lambda: [])

    @staticmethod
    def step(acc, syms):
        acc.extend(syms)
        return acc


def bpe_token_count(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """Per-row trained-tokenizer token count — the drop-in replacement
    for the whitespace ``token_count`` column wherever the curation
    layer takes an ``n_tokens``/``token_col`` contract
    (``token_budget_sample``, ``pack_concat``, shard manifests), so
    budgets and packing spans mean real model tokens. Arrow-batched,
    per-word memoized; NULL text → NULL count."""
    return _apply_map(df, model, text_col, out_col, "bigint", _Count)


def bpe_tokens(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Per-row subword token sequence (``array<string>``) under the
    trained merges — feed to downstream featurizers or inspect
    segmentations. NULL text → NULL."""
    return _apply_map(df, model, text_col, out_col, "array<string>", _Toks)


def write_bpe_model(spark, model: BPEModel, path: str,
                    mode: str = "overwrite") -> None:
    """Persist merges through the shared checksummed sidecar."""
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(spark, path, "bpe_merges", {
        "merges": [[str(a), str(b)] for a, b in model.merges],
    }, mode=mode)


def read_bpe_model(spark, path: str) -> BPEModel:
    """Load a :func:`write_bpe_model` sidecar."""
    from ..sources.sidecar import read_model_sidecar

    p = read_model_sidecar(spark, path, "bpe_merges")
    return BPEModel(merges=[[a, b] for a, b in p["merges"]])


#: token-id space: single characters use their Unicode codepoint,
#: merge outputs use MERGE_ID_BASE + merge rank — disjoint by
#: construction (MERGE_ID_BASE is one past the last codepoint), so no
#: trained vocab table is needed to encode and ids are stable across
#: corpora for the same merge list.
MERGE_ID_BASE = 0x110000


def bpe_symbol_ids(model: BPEModel) -> dict:
    """Merge-output symbol → token id (rank-based; single characters
    are implicit codepoint ids)."""
    return {a + b: MERGE_ID_BASE + k
            for k, (a, b) in enumerate(model.merges)}


def bpe_encode(
    df: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Per-row token-ID sequence (``array<bigint>``) under the trained
    merges — the train-ready form: feed it to
    :func:`~.packing.materialize_packs_ids` for packed ID sequences.
    ``size(token_ids)`` equals :func:`bpe_token_count`'s value by
    construction (tested), so spans computed from the count column
    slice the ID arrays exactly. Word boundaries are not marked with a
    separator id (merges never cross words; add one downstream if the
    training recipe wants it). NULL text → NULL."""
    sym_ids = bpe_symbol_ids(model)

    class _Ids:
        start = staticmethod(lambda: [])

        @staticmethod
        def step(acc, syms):
            acc.extend(
                sym_ids[s] if len(s) > 1 else ord(s) for s in syms)
            return acc

    return _apply_map(df, model, text_col, out_col, "array<bigint>", _Ids)
