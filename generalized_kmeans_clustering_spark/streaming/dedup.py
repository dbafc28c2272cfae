"""Streaming deduplication over document streams.

Engine extension: the batch dedup operators (``operators/dedup.py``)
re-expressed for Structured Streaming. Exact dedup maps onto Spark's
own watermarked ``dropDuplicates`` state store — content fingerprints
are the dedup key, the watermark bounds state size, and the identical
plan runs batch or streaming. Signature computation (MinHash/SimHash)
is stateless expression work, so those operators run verbatim on a
streaming DataFrame; only the pair JOIN is batch-only (stream-stream
self-joins need two watermarked sides — run LSH banding per
micro-batch via ``foreachBatch`` when near-dup pairs are needed live).

At scale: dedup state is one row per distinct fingerprint inside the
watermark horizon — state grows with distinct content per window, not
with stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint

__all__ = ["streaming_exact_dedup", "streaming_minhash_signatures"]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per content fingerprint on a streaming frame.

    With ``ts_col`` the stream is watermarked and Spark drops
    fingerprint state older than ``watermark`` (exactly-once dedup
    within the horizon — the standard unbounded-state guard). Without
    ``ts_col`` state is global and unbounded: correct, but only sane
    for bounded backfills. Works identically on a batch frame (same
    plan, state-free).
    """
    out = stream.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    if ts_col is not None:
        out = (out.withWatermark(ts_col, watermark)
               .dropDuplicatesWithinWatermark(["_fp"]))
    else:
        out = out.dropDuplicates(["_fp"])
    return out.drop("_fp")


def streaming_minhash_signatures(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures on a stream — stateless projection, so the
    batch operator applies verbatim (one fold per row, no shuffle, no
    state). Returned frame is writeStream-able to feed a downstream
    batch LSH join or a ``foreachBatch`` near-dup stage."""
    from ..operators.dedup import minhash_signatures

    return minhash_signatures(stream, text_col=text_col, id_col=id_col,
                              num_hashes=num_hashes, shingle_n=shingle_n,
                              seed=seed)
