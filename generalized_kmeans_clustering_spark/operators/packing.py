"""Sequence packing: documents → fixed-length training sequences.

Engine extensions (driver mandate: large-scale training-data pipeline
operators). LLM pretraining consumes fixed ``seq_len`` token windows;
the corpus is variable-length documents. Two standard packings:

- :func:`pack_concat` — the "concat-and-split" packing every major
  pretraining pipeline uses: documents are laid out in a deterministic
  stream order, and the stream is sliced at exact ``seq_len``
  boundaries. A document crossing a boundary contributes SPANS to both
  sequences. Every sequence except the last per shard is exactly full
  (zero padding waste). Pure expressions: a window cumsum gives each
  doc its stream interval; the crossed windows explode via
  ``sequence``/``inline``.
- :func:`pack_next_fit` — greedy next-fit WITHOUT splitting: a doc
  that would overflow the open sequence starts a new one; docs longer
  than ``seq_len`` get a flagged singleton pack. Inherently a
  sequential walk, so it runs as an Arrow ``applyInPandas`` per shard.

Distribution model (both): documents are hash-assigned to
``num_shards`` independent streams and packing is per-shard — the
classic trick that makes an inherently sequential layout
embarrassingly parallel at the cost of ≤1 partial sequence per shard.
Order within a shard is ``(hash(id, seed), id)``: deterministic across
runs, partitionings and engines (``hash_fn="md5"`` is bit-identical in
the DuckDB oracle).

At 100 TB: one shuffle keyed on the shard (window cumsum), then
map-only span math. Shard count bounds the partial-sequence waste at
``num_shards·seq_len`` tokens — negligible against any real corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .sampling import hash_key as _order_key

__all__ = ["pack_concat", "pack_next_fit", "materialize_packs",
           "materialize_packs_ids"]


def pack_concat(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 64,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Concat-and-split packing → one row per (document × sequence)
    span: ``(id, shard, pack, pack_offset, doc_offset, length)``.

    ``pack`` numbers sequences within the shard; ``(shard, pack)`` is
    the global sequence key. ``doc_offset``/``length`` slice the
    document's tokens; ``pack_offset`` places the slice in the
    sequence. Invariants (tested): every pack except the last per
    shard sums to exactly ``seq_len``; each document's spans reassemble
    it exactly.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    key = _order_key(F.col(id_col), seed, hash_fn)
    staged = (
        df.select(id_col, F.col(token_col).cast("long").alias("_n"))
        .where(F.col("_n") > 0)
        .withColumn("_key", key)
        .withColumn("shard", F.pmod(F.col("_key"), F.lit(num_shards))
                    .cast("int"))
    )
    w = (Window.partitionBy("shard").orderBy("_key", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = staged.withColumn("_cum", F.sum("_n").over(w)) \
                   .withColumn("_prev", F.col("_cum") - F.col("_n"))
    L = F.lit(int(seq_len))
    # `div` is exact long integer division (both operands non-negative
    # here); `floor(x / L)` would round-trip through double and give
    # off-by-one pack boundaries past 2^53 cumulative tokens.
    p0 = F.expr(f"_prev div {int(seq_len)}")
    p1 = F.expr(f"(_cum - 1) div {int(seq_len)}")
    spans = F.transform(
        F.sequence(p0, p1),
        lambda p: F.struct(
            p.cast("long").alias("pack"),
            F.greatest(F.col("_prev") - p * L, F.lit(0))
            .alias("pack_offset"),
            F.greatest(p * L - F.col("_prev"), F.lit(0))
            .alias("doc_offset"),
            (F.least((p + 1) * L, F.col("_cum"))
             - F.greatest(p * L, F.col("_prev"))).alias("length"),
        ),
    )
    return staged.select(
        id_col, "shard", F.inline(spans)
    ).select(id_col, "shard", "pack", "pack_offset", "doc_offset", "length")


def pack_next_fit(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_shards: int = 64,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Greedy next-fit packing (documents never split) →
    ``(id, shard, pack, pack_offset, overflow)``.

    A document that would overflow the open sequence closes it and
    starts the next; a document longer than ``seq_len`` occupies a
    singleton pack with ``overflow=true`` (the caller decides whether
    to truncate, chunk with :func:`pack_concat`, or drop).

    SCALE CAVEAT: the per-shard walk is an Arrow grouped-map, and
    ``applyInPandas`` materializes EACH SHARD's (id, n_tokens, key)
    rows as one in-memory pandas frame before the walk — so size
    ``num_shards`` such that corpus_rows/num_shards × ~32 B fits an
    executor (e.g. 10 B docs → num_shards ≥ ~4096), and note
    ``num_shards`` also caps parallelism. :func:`pack_concat` has no
    such limit (pure window cumsum) and is the preferred form at
    extreme scale.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    import pandas as pd

    key = _order_key(F.col(id_col), seed, hash_fn)
    staged = (
        df.select(id_col, F.col(token_col).cast("long").alias("_n"))
        .where(F.col("_n") > 0)
        .withColumn("_key", key)
        .withColumn("shard", F.pmod(F.col("_key"), F.lit(num_shards))
                    .cast("int"))
    )
    id_type = dict(staged.dtypes)[id_col]
    L = int(seq_len)

    def _walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_key", id_col], kind="mergesort")
        packs, offsets, overflows = [], [], []
        pack, fill = 0, 0
        for n in pdf["_n"]:
            n = int(n)
            if n > L:  # flagged singleton pack
                if fill > 0:
                    pack += 1
                packs.append(pack)
                offsets.append(0)
                overflows.append(True)
                pack += 1
                fill = 0
                continue
            if fill + n > L:
                pack += 1
                fill = 0
            packs.append(pack)
            offsets.append(fill)
            overflows.append(False)
            fill += n
        out = pdf[[id_col, "shard"]].copy()
        out["pack"] = packs
        out["pack_offset"] = offsets
        out["overflow"] = overflows
        return out

    schema = (f"{id_col} {id_type}, shard int, pack long, "
              "pack_offset long, overflow boolean")
    return staged.groupBy("shard").applyInPandas(_walk, schema)


def materialize_packs(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_sep: str = " ",
) -> DataFrame:
    """Turn :func:`pack_concat` spans into actual training-sequence
    TEXT: ``(shard, pack, n_docs, n_tokens, text)`` with each
    document's token slice placed at its ``pack_offset`` and slices
    joined in order (tokens = whitespace words, matching
    ``functions.text.token_count``'s corpus convention).

    Plan: one equi-join of spans (span rows ≈ docs + boundary
    crossings) against the corpus on the doc id, a per-span token
    slice (``slice`` over the split array — pure expressions), and one
    groupBy on (shard, pack) whose ``sort_array(collect_list(struct))``
    reassembles slices in offset order. Shuffle volume = the packed
    text itself (the output), keyed on the sequence id — no skew
    (every sequence is ≤ seq_len tokens by construction).
    """
    pieces = (
        spans.join(docs.select(id_col, text_col), id_col)
        .withColumn(
            "_piece",
            F.array_join(
                F.slice(F.split(F.col(text_col), " "),
                        F.col("doc_offset").cast("int") + 1,
                        F.col("length").cast("int")),
                " "),
        )
    )
    return (
        pieces.groupBy("shard", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("length").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pack_offset"), F.col("_piece")))),
                    lambda s: s["_piece"],
                ),
                doc_sep,
            ).alias(text_col),
        )
    )


def materialize_packs_ids(
    encoded: DataFrame,
    spans: DataFrame,
    ids_col: str = "token_ids",
    id_col: str = "doc_id",
) -> DataFrame:
    """Turn :func:`pack_concat` spans into TRAIN-READY packed token-ID
    sequences: ``(shard, pack, n_docs, n_tokens, token_ids)`` with
    each document's ID slice placed at its ``pack_offset`` and slices
    concatenated in order. ``encoded`` carries an ``array<bigint>``
    column (:func:`~.tokenizer.bpe_encode`) whose size MUST equal the
    ``n_tokens`` the spans were computed from — pack with
    :func:`~.tokenizer.bpe_token_count` counts and that holds by
    construction.

    Same plan shape as :func:`materialize_packs`: one equi-join of
    spans against the encoded corpus on the doc id, a per-span
    ``slice`` of the ID array, and one groupBy on (shard, pack) whose
    offset-sorted reassembly flattens to the final sequence. Shuffle
    volume = the packed IDs themselves, keyed on the sequence id, no
    skew (every sequence ≤ seq_len ids by construction).
    """
    pieces = (
        spans.join(encoded.select(id_col, ids_col), id_col)
        .withColumn(
            "_piece",
            F.slice(F.col(ids_col),
                    F.col("doc_offset").cast("int") + 1,
                    F.col("length").cast("int")),
        )
    )
    return (
        pieces.groupBy("shard", "pack")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("length").alias("n_tokens"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("pack_offset"), F.col("_piece")))),
                    lambda s: s["_piece"],
                ),
            ).alias(ids_col),
        )
    )
