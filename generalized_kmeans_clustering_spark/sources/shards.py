"""Training-shard sink: packed sequences → content-addressed shard
files + manifest.

Engine extension (driver mandate: training-data pipeline operators).
The last step of the corpus pipeline — after
:func:`~..operators.packing.materialize_packs` produces
``(shard, pack, n_docs, n_tokens, text)`` training sequences — is
handing them to a trainer as shard files whose bytes are verifiable:
a resumed/repeated pipeline run must either reproduce each shard
bit-for-bit or fail loudly, and a trainer must be able to prove it
read the data the pipeline wrote.

- :func:`write_training_shards` writes the sequences as parquet
  PARTITIONED BY shard (a trainer's reader streams one shard per
  worker; partition pruning serves single-shard reads) plus a
  ``manifest`` dataset with one row per shard:
  ``(shard, n_packs, n_docs, n_tokens, sha256)`` where ``sha256``
  content-addresses the shard — sha2 over the pack-ordered per-pack
  text hashes. The manifest is computed distributively (one groupBy
  on shard, every per-shard group ≤ the shard's packs) and written
  through Spark so data and manifest land on the same filesystem.
- :func:`read_training_shards` loads both.
- :func:`verify_training_shards` recomputes the content hashes from
  the data files and returns the mismatching shards (empty = intact):
  the integrity gate for "did the copy/transform/trainer see exactly
  what was written".

Everything is deterministic given the pipeline's own determinism
(hash-ordered packing): same corpus + same params → byte-identical
manifest, so the manifest doubles as a cross-run reproducibility
check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "shard_manifest",
    "write_training_shards",
    "read_training_shards",
    "verify_training_shards",
]


def _pack_content_hash(packs: DataFrame, content_col: str):
    """Per-pack content sha256. Array columns (packed token IDs) hash
    their comma-joined string form; a NULL content hashes to the
    sentinel token ``"-"`` (not a 64-hex digest, so it cannot collide
    with any real hash, and distinct from the empty string's digest):
    without it ``sha2`` yields NULL and ``array_join`` silently SKIPS
    the element, making a NULL-content pack's shard digest equal an
    intact shard's — a blind spot in the
    :func:`verify_training_shards` integrity gate."""
    col = F.col(content_col)
    if dict(packs.dtypes)[content_col].startswith("array"):
        col = F.array_join(
            F.transform(col, lambda x: x.cast("string")), ",")
    return F.coalesce(F.sha2(col.cast("binary"), 256), F.lit("-"))


def shard_manifest(packs: DataFrame, content_col: str = "text") -> DataFrame:
    """``(shard, n_packs, n_docs, n_tokens, sha256)`` — one row per
    shard; ``sha256`` hashes the newline-joined, pack-ordered per-pack
    content sha256s (hashing hashes keeps the shuffled bytes small: 64
    hex chars per pack, not the pack content). ``content_col`` may be
    the materialized text or a packed token-ID array
    (:func:`~..operators.packing.materialize_packs_ids`)."""
    return (
        packs.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sha2(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(
                            F.col("pack"),
                            _pack_content_hash(packs, content_col)
                            .alias("h"),
                        ))),
                        lambda s: s["h"],
                    ),
                    "\n",
                ).cast("binary"),
                256,
            ).alias("sha256"),
        )
    )


def write_training_shards(
    packs: DataFrame, path: str, mode: str = "overwrite",
    content_col: str = "text",
) -> None:
    """Write ``packs`` (the :func:`materialize_packs` or
    :func:`materialize_packs_ids` schema — pass
    ``content_col="token_ids"`` for the latter) as ``<path>/data``
    parquet partitioned by shard + ``<path>/manifest`` JSON. One extra
    shard-keyed aggregation for the manifest; the data write itself is
    map-only into the partition layout."""
    packs.write.mode(mode).partitionBy("shard").parquet(f"{path}/data")
    (
        shard_manifest(packs, content_col=content_col)
        .coalesce(1)
        .write.mode(mode).json(f"{path}/manifest")
    )


def read_training_shards(spark, path: str):
    """Returns ``(packs_df, manifest_df)``. Filtering ``packs_df`` on
    ``shard`` prunes to that shard's files (PartitionFilters in the
    plan) — the single-shard read a per-worker data loader does."""
    packs = spark.read.parquet(f"{path}/data")
    manifest = spark.read.json(f"{path}/manifest").select(
        "shard", "n_packs", "n_docs", "n_tokens", "sha256")
    return packs, manifest


def verify_training_shards(spark, path: str,
                           content_col: str = "text") -> DataFrame:
    """Recompute every shard's content hash from the data files and
    full-outer-join against the manifest: returns
    ``(shard, expected_sha256, actual_sha256)`` for shards that are
    missing, extra, or content-changed. Empty result = intact. Pass
    the same ``content_col`` the writer used."""
    packs, manifest = read_training_shards(spark, path)
    actual = shard_manifest(packs, content_col=content_col).select(
        "shard", F.col("sha256").alias("actual_sha256"))
    expected = manifest.select(
        "shard", F.col("sha256").alias("expected_sha256"))
    return (
        expected.join(actual, "shard", "full_outer")
        .where(
            F.col("expected_sha256").isNull()
            | F.col("actual_sha256").isNull()
            | (F.col("expected_sha256") != F.col("actual_sha256"))
        )
        .select("shard", "expected_sha256", "actual_sha256")
    )
