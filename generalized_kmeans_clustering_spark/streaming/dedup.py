"""Streaming deduplication over document streams.

Engine extension: the batch dedup operators (``operators/dedup.py``)
re-expressed for Structured Streaming. Exact dedup maps onto Spark's
own watermarked ``dropDuplicates`` state store — content fingerprints
are the dedup key, the watermark bounds state size, and the identical
plan runs batch or streaming. Signature computation (MinHash/SimHash)
is stateless expression work, so those operators run verbatim on a
streaming DataFrame. The pair JOIN runs live two ways:

- :func:`streaming_lsh_pairs` — a TRUE declarative watermarked
  stream-stream self-join on the banded signatures: Spark's symmetric
  hash join keeps both sides' state, the event-time range condition
  lets the watermark evict it, and pairs are found across micro-batch
  boundaries within the time horizon. Fully planned by the engine — no
  side-managed state.
- :class:`StreamingNearDup` — a ``foreachBatch`` handler that LSH-bands
  each micro-batch against itself AND an accumulated signature state
  store. Choose this when pairs must be found against ALL history (an
  unbounded dedup horizon), which no watermarked join can express. See
  ``examples/streaming_near_dup.py`` for the worked end-to-end flow.

At scale: dedup state is one row per distinct fingerprint inside the
watermark horizon — state grows with distinct content per window, not
with stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint

__all__ = ["streaming_exact_dedup", "streaming_minhash_signatures",
           "streaming_lsh_pairs", "StreamingNearDup",
           "streaming_throttle"]


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


def _band_explode(sigs: DataFrame, id_col: str, num_hashes: int,
                  num_bands: int, extra_cols: tuple = ()) -> DataFrame:
    """Explode signatures to (id, signature, band, bucket) rows —
    bucket = xxhash64 of the band's signature components."""
    rows_per_band = num_hashes // num_bands

    def key(b):
        return F.xxhash64(F.concat_ws(",", *[
            F.element_at("signature", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]))

    return sigs.select(
        id_col, "signature", *extra_cols,
        F.posexplode(F.array(*[key(b) for b in range(num_bands)]))
        .alias("band", "bucket"),
    )


def streaming_lsh_pairs(
    stream: DataFrame,
    ts_col: str = "ts",
    horizon: str = "10 minutes",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    threshold: float | None = None,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    dedup_pairs: bool = True,
) -> DataFrame:
    """TRUE watermarked stream-stream LSH near-dup join →
    streaming ``(i, j, ts, est_jaccard)``.

    Fully declarative: signatures are a stateless fold, the banded
    frame self-joins under Spark's symmetric hash join with BOTH sides
    watermarked on ``ts_col``, and the event-time range condition
    (``|ts_i - ts_j| <= horizon``) is what lets the watermark evict
    join state — so state is bounded by stream rate x horizon, not by
    history. Pairs ARE found across micro-batch boundaries (unlike a
    per-batch self-join); pairs farther apart than ``horizon`` in
    event time are by definition out of scope — use
    :class:`StreamingNearDup` when the dedup horizon must be unbounded.

    ``est_jaccard`` is the fraction of agreeing MinHash components
    (same estimator as :class:`StreamingNearDup`); pass ``threshold``
    to filter. With ``dedup_pairs`` a pair matching in several bands is
    emitted once via ``dropDuplicatesWithinWatermark`` (state likewise
    watermark-bounded). ``ts`` is the smaller-id document's event time
    (the raw watermarked column — a derived time would untag the
    watermark and break the downstream dedup).

    At 100 TB-scale rates: shuffle is keyed on (band, bucket) — the
    same bucketed join as the batch operator, never all-pairs; both
    stateful operators' stores hold only the horizon window.
    """
    from ..operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        stream, text_col=text_col, id_col=id_col, num_hashes=num_hashes,
        shingle_n=shingle_n, seed=seed, hash_fn=hash_fn,
        keep_cols=(ts_col,),
    )
    bands = _band_explode(sigs, id_col, num_hashes, num_bands,
                          extra_cols=(ts_col,)) \
        .withWatermark(ts_col, horizon)
    l, r = bands.alias("l"), bands.alias("r")
    joined = l.join(r, F.expr(
        f"l.band = r.band AND l.bucket = r.bucket "
        f"AND l.{id_col} < r.{id_col} "
        f"AND r.{ts_col} >= l.{ts_col} - interval {horizon} "
        f"AND r.{ts_col} <= l.{ts_col} + interval {horizon}"
    ))
    pairs = joined.select(
        F.col(f"l.{id_col}").alias("i"),
        F.col(f"r.{id_col}").alias("j"),
        # must stay the raw left-side event-time column: any derived
        # expression (e.g. least(l.ts, r.ts)) loses the watermark tag
        # and dropDuplicatesWithinWatermark refuses the plan
        F.col(f"l.{ts_col}").alias(ts_col),
        (F.aggregate(
            F.zip_with("l.signature", "r.signature",
                       lambda a, b: (a == b).cast("int")),
            F.lit(0), lambda acc, v: acc + v,
        ) / F.lit(float(num_hashes))).alias("est_jaccard"),
    )
    if threshold is not None:
        pairs = pairs.where(F.col("est_jaccard") >= threshold)
    if dedup_pairs:
        pairs = pairs.dropDuplicatesWithinWatermark(["i", "j"])
    return pairs


class StreamingNearDup:
    """Incremental cross-batch near-duplicate detection.

    Engine extension: MinHash-LSH near-dup over a document STREAM.
    Per micro-batch (a ``foreachBatch`` handler):

    1. signatures for the batch (stateless fold);
    2. LSH-band join of the batch against the accumulated signature
       store AND itself → candidate pairs (bucketed, never all-pairs);
    3. verification by ESTIMATED Jaccard — the fraction of agreeing
       MinHash components (the standard unbiased estimator; exact
       shingle Jaccard would require retaining every past text,
       estimation needs only the H·8-byte signature);
    4. confirmed pairs appended to ``pairs_dir``; batch signatures
       appended to the state store.

    State grows one signature row per document seen — H·8 bytes each,
    independent of text size. At 100 TB the store is itself a big
    table; the band join stays bucketed because both sides band first.

    Usage::

        nd = StreamingNearDup(state_dir, pairs_dir, threshold=0.7)
        q = (stream.writeStream.foreachBatch(nd.process_batch)
             .option("checkpointLocation", ckpt).start())

    or call ``process_batch(df, batch_id)`` directly from any batch
    loop. Restart safety comes from the streaming checkpoint: a batch
    replay overwrites its own pairs partition (idempotent per
    ``batch_id``) rather than double-appending.
    """

    def __init__(self, state_dir: str, pairs_dir: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 32, num_bands: int = 8,
                 shingle_n: int = 3, threshold: float = 0.8,
                 seed: int = 42, hash_fn: str = "xxhash64",
                 where=None):
        self.state_dir = state_dir
        self.pairs_dir = pairs_dir
        self.text_col = text_col
        self.id_col = id_col
        self.num_hashes = num_hashes
        self.num_bands = num_bands
        self.shingle_n = shingle_n
        self.threshold = threshold
        self.seed = seed
        # 'md5' makes signatures (hence pairs) cross-engine
        # reproducible for oracle checks; xxhash64 is production.
        self.hash_fn = hash_fn
        # candidate predicate (Column or SQL string over the stream's
        # columns), applied BEFORE signatures — excluded rows never
        # enter the signature store or any pair join (the r9 layer
        # convention shared with ivf_topk/knn_graph's ``where=``)
        self.where = where

    def _bands(self, sigs: DataFrame) -> DataFrame:
        return _band_explode(sigs, self.id_col, self.num_hashes,
                             self.num_bands)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.dedup import minhash_signatures
        from ..operators.similarity import _candidate_filter

        spark = batch_df.sparkSession
        batch_df = _candidate_filter(batch_df, self.where)
        sigs = minhash_signatures(
            batch_df, text_col=self.text_col, id_col=self.id_col,
            num_hashes=self.num_hashes, shingle_n=self.shingle_n,
            seed=self.seed, hash_fn=self.hash_fn,
        ).localCheckpoint(eager=True)
        new_bands = self._bands(sigs)
        try:
            # exclude this batch's own partition: on a checkpoint
            # replay the previous attempt's signatures must not pair
            # against themselves
            old = spark.read.parquet(self.state_dir).where(
                F.col("batch_id") != int(batch_id))
        except Exception:
            old = None
        # candidates: new-vs-old (any order) plus new-vs-new (i < j)
        sides = [new_bands.alias("l").join(
            new_bands.alias("r"), ["band", "bucket"])
            .where(F.col(f"l.{self.id_col}") < F.col(f"r.{self.id_col}"))]
        if old is not None:
            sides.append(new_bands.alias("l").join(
                self._bands(old).alias("r"), ["band", "bucket"]))
        est = None
        for cand in sides:
            pairs = cand.select(
                F.col(f"l.{self.id_col}").alias("i"),
                F.col(f"r.{self.id_col}").alias("j"),
                F.col("l.signature").alias("_si"),
                F.col("r.signature").alias("_sj"),
            ).where(F.col("i") != F.col("j")).distinct()
            scored = pairs.withColumn(
                "est_jaccard",
                F.aggregate(
                    F.zip_with("_si", "_sj",
                               lambda a, b: (a == b).cast("int")),
                    F.lit(0), lambda acc, v: acc + v,
                ) / F.lit(float(self.num_hashes)),
            ).where(F.col("est_jaccard") >= self.threshold) \
             .select("i", "j", "est_jaccard")
            est = scored if est is None else est.unionByName(scored)
        out = est.distinct().withColumn("batch_id", F.lit(int(batch_id)))
        # idempotent per batch: a checkpoint replay rewrites, not appends
        (out.write.mode("overwrite")
            .partitionBy("batch_id").option(
                "partitionOverwriteMode", "dynamic")
            .parquet(self.pairs_dir))
        sigs.withColumn("batch_id", F.lit(int(batch_id))) \
            .write.mode("overwrite") \
            .partitionBy("batch_id").option(
                "partitionOverwriteMode", "dynamic") \
            .parquet(self.state_dir)

    def pairs(self, spark) -> DataFrame:
        """All confirmed near-dup pairs so far. Empty-store safe: before
        any pair is found the partitioned dir has no parquet footers to
        infer from, so an explicit empty frame is returned."""
        try:
            return spark.read.parquet(self.pairs_dir)
        except Exception:
            return spark.createDataFrame(
                [], "i long, j long, est_jaccard double, batch_id int")


def streaming_throttle(
    stream: DataFrame,
    entity_cols=("user_id", "event_type"),
    ts_col: str = "ts",
    window_seconds: float = 60.0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of :func:`...operators.rollup.throttle_events`:
    at most one event per entity per fixed ``window_seconds`` window,
    enforced with ``dropDuplicatesWithinWatermark`` state on
    (entity, window bucket) — state evicts once the watermark passes
    the bucket, so memory is rate x horizon, not history.

    Semantics note: streaming keeps the first ARRIVAL per window
    (state sees events in arrival order); the batch operator keeps the
    earliest EVENT TIME with a deterministic tiebreak. The two agree
    when arrival order matches event-time order (in-order replay —
    test-asserted); under out-of-order arrival the streaming result is
    the standard at-most-one-per-window rate limit, not a minimum.
    """
    if window_seconds <= 0:
        raise ValueError("streaming_throttle: window_seconds must be > 0")
    from pyspark.sql import types as T
    from ..operators.rollup import throttle_grid_us

    # NTZ parquet: cast in place — a watermark needs TimestampType and
    # must stay attached to the SAME column the state key derives from
    if not isinstance(stream.schema[ts_col].dataType, T.TimestampType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # shared grid helper so fractional windows tile the SAME epoch
    # buckets as throttle_events and streaming/throttle.py (the r12
    # advisor's grid-mismatch finding applied here too: a truncated
    # w_us at e.g. 8.2s put boundary events in different buckets than
    # the batch twin)
    w_us = throttle_grid_us(window_seconds)
    bucket = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(w_us))
    return (
        stream.withColumn("_bucket", bucket)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(entity_cols) + ["_bucket"])
        .drop("_bucket")
    )
