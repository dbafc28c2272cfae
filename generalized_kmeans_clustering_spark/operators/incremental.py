"""Incremental dedup: new documents vs a persisted corpus snapshot.

Engine extension (training-data pipeline). The batch dedup family
(``operators/dedup.py``) answers "which rows of THIS frame duplicate
each other"; production corpora grow in DELTAS — a fresh crawl lands
against petabytes already curated, and re-deduping the union from
scratch every time is O(corpus) work for an O(delta)-sized question.
The incremental shape keeps a compact persisted STORE (exact
fingerprints, MinHash signatures) and answers "which NEW rows
duplicate the store, and which duplicate each other" touching only
``store ⨝ delta``:

- :func:`fingerprint_store` / :func:`incremental_exact_dedup` /
  :func:`updated_fingerprint_store` — exact content identity. The
  store is one row per distinct fingerprint with its canonical doc id;
  the delta pass is ONE fingerprint-keyed left join plus ONE
  within-delta window. Union the surviving fingerprints back and the
  store is ready for the next delta — the loop invariant (store ==
  fingerprint_store of everything accepted so far) is test-enforced.
- :func:`incremental_lsh_pairs` — near-dup candidates of the delta
  against a signature store, banded exactly like
  :func:`~.dedup.lsh_candidate_pairs` but joining delta bands against
  store bands (never store × store, which is the already-paid cost of
  past rounds). ``include_delta_pairs=True`` adds the delta's own
  self-join for one-call "new vs world" candidates.

This is the batch twin of ``streaming/dedup.StreamingNearDup`` (same
store-join shape, no micro-batch loop) — use the streaming class when
deltas arrive continuously, these operators when they arrive as
scheduled drops.

At 100 TB: the store shuffles once on its key at write time (or lives
as a bucketed table — ``sources/bucketing.py`` — making every delta
join exchange-free on the store side); a delta pass shuffles only the
delta. Store size is one row per DISTINCT content, which for heavily
duplicated web corpora is far below corpus row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import doc_fingerprint
from .dedup import _band_explode_meta

__all__ = [
    "fingerprint_store",
    "incremental_exact_dedup",
    "updated_fingerprint_store",
    "incremental_lsh_pairs",
]


def fingerprint_store(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(fingerprint, keep_id)`` — one row per distinct content, the
    persistable exact-dedup state of a corpus snapshot. ``keep_id`` is
    the canonical (min-id) document carrying that content."""
    return (
        df.select(
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"))
    )


def incremental_exact_dedup(
    new_df: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-delta-row verdicts against a :func:`fingerprint_store`:
    ``(id, fingerprint, in_store, dup_of, is_canonical)``.

    - ``in_store`` — content already exists in the snapshot.
    - ``is_canonical`` — first (min-id) occurrence of content NOT in
      the store; exactly the rows to accept.
    - ``dup_of`` — the id this row duplicates: the store's ``keep_id``
      when ``in_store``, the delta's canonical id for within-delta
      dups, NULL for canonical rows.

    One fingerprint-keyed left join (store side broadcast-able while
    small, bucketed at scale) + one within-delta window per
    fingerprint. Every delta row gets a verdict — filtering is the
    caller's ``.where("is_canonical")``.
    """
    fp = new_df.select(
        F.col(id_col).alias("id"),
        doc_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
    joined = fp.join(
        store.select(
            "fingerprint", F.col("keep_id").alias("_store_keep")
        ),
        on="fingerprint",
        how="left",
    )
    w = Window.partitionBy("fingerprint").orderBy("id")
    batch_keep = F.min("id").over(
        Window.partitionBy("fingerprint")
    )
    first = F.row_number().over(w) == 1
    in_store = F.col("_store_keep").isNotNull()
    return joined.select(
        "id",
        "fingerprint",
        in_store.alias("in_store"),
        F.when(in_store, F.col("_store_keep"))
        .when(~first, batch_keep)
        .alias("dup_of"),
        (~in_store & first).alias("is_canonical"),
    )


def updated_fingerprint_store(
    store: DataFrame, verdicts: DataFrame
) -> DataFrame:
    """Next-round store: the old store plus the delta's canonical
    fingerprints. Maintains the loop invariant that the store equals
    :func:`fingerprint_store` over every accepted document so far."""
    additions = verdicts.where(F.col("is_canonical")).select(
        "fingerprint", F.col("id").alias("keep_id")
    )
    return store.unionByName(additions)


def incremental_lsh_pairs(
    new_sigs: DataFrame,
    store_sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    num_hashes: int | None = None,
    include_delta_pairs: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs of a signature delta against a
    signature store: ``(i, j)`` with ``i`` a delta id and ``j`` a
    store id sharing ≥1 LSH band bucket (plus delta-internal pairs
    ``i < j`` when ``include_delta_pairs``).

    The join is keyed on ``(band, bucket)`` — delta bands against
    store bands only. Work is proportional to delta size and bucket
    collision rate, never to store × store. Feed the pairs to
    :func:`~.dedup.jaccard_verify` over the union frame for exact
    similarity, then to :func:`~.dedup.duplicate_components`.

    Both signature frames must share the MinHash parameterization
    (``num_hashes``, seed, shingle_n) — signatures from different
    parameter sets never collide meaningfully. Width is read from
    ``signature`` column metadata when ``num_hashes`` is None.
    """
    delta_bands = _band_explode_meta(
        new_sigs, id_col, num_hashes, num_bands
    ).select(F.col(id_col).alias("i"), "band", "bucket")
    store_bands = _band_explode_meta(
        store_sigs, id_col, num_hashes, num_bands
    ).select(F.col(id_col).alias("j"), "band", "bucket")
    cross = (
        delta_bands.join(store_bands, on=["band", "bucket"])
        .select("i", "j")
        .distinct()
    )
    if not include_delta_pairs:
        return cross
    right = delta_bands.select(
        F.col("i").alias("j"), "band", "bucket"
    )
    within = (
        delta_bands.join(right, on=["band", "bucket"])
        .where(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
    )
    return cross.unionByName(within)
