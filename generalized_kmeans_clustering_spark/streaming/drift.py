"""Streaming corpus-drift monitoring over a document stream.

Engine extension: the batch drift audit (``operators/drift.py``)
re-expressed for Structured Streaming via ``foreachBatch`` with a
persisted per-batch token-count store — the drift sibling of
:class:`~.semantic.StreamingSemanticDedup`. A fixed REFERENCE token
distribution (last month's snapshot, the accepted-corpus counts —
written once with :meth:`StreamingDriftMonitor.write_reference`) is
compared against the arriving stream two ways:

- per batch: how different is THIS drop (a poisoned or off-domain
  delivery shows up immediately);
- cumulative: how different is everything streamed so far — the gate
  a training run checks before admitting the stream to the mix.

Batch parity: token counts are additive, so the cumulative gauges
after any micro-batching equal the batch
:func:`~..operators.drift.corpus_drift` of (all streamed docs) vs the
reference — the oracle row replays documents as an availableNow
stream and compares value-for-value against the batch SQL twin.

State = one ``(batch_id, token, n)`` row per distinct token per batch
(zipfian: far below token volume); each batch's partition is
idempotently overwritten on checkpoint replay. The only non-additive
work (the full-outer join + final agg) runs over COUNT frames, never
documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["StreamingDriftMonitor"]


class StreamingDriftMonitor:
    """Incremental drift gauges against a fixed reference distribution.

    Usage::

        StreamingDriftMonitor.write_reference(ref_docs, ref_dir)
        mon = StreamingDriftMonitor(ref_dir, state_dir, gauges_dir)
        q = (stream.writeStream.foreachBatch(mon.process_batch)
             .option("checkpointLocation", ckpt).start())
        mon.cumulative_drift(spark)   # the admission gate
        mon.gauges(spark)             # per-batch history
    """

    def __init__(self, ref_counts_dir: str, state_dir: str,
                 gauges_dir: str, text_col: str = "text",
                 alpha: float = 0.5, n_buckets: int | None = None,
                 seed: int = 7):
        if alpha < 0:
            raise ValueError(f"alpha must be >= 0, got {alpha}")
        self.ref_counts_dir = ref_counts_dir
        self.state_dir = state_dir
        self.gauges_dir = gauges_dir
        self.text_col = text_col
        self.alpha = float(alpha)
        self.n_buckets = n_buckets
        self.seed = seed

    # -- reference ----------------------------------------------------
    @staticmethod
    def write_reference(ref_df: DataFrame, ref_counts_dir: str,
                        text_col: str = "text",
                        n_buckets: int | None = None,
                        seed: int = 7) -> None:
        """Persist the reference ``(token, n)`` distribution once.
        Bucketing parameters must match the monitor's."""
        from ..operators.drift import token_counts

        token_counts(ref_df, text_col, n_buckets, seed) \
            .write.mode("overwrite").parquet(ref_counts_dir)

    def _ref(self, spark) -> DataFrame:
        return spark.read.parquet(self.ref_counts_dir)

    def _state(self, spark) -> DataFrame | None:
        try:
            return spark.read.parquet(self.state_dir)
        except Exception:
            return None

    # -- streaming ----------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.drift import drift_from_counts, token_counts

        spark = batch_df.sparkSession
        counts = token_counts(
            batch_df, self.text_col, self.n_buckets, self.seed
        ).localCheckpoint(eager=True)
        # per-batch gauge vs the reference
        row = drift_from_counts(
            self._ref(spark), counts, alpha=self.alpha
        ).withColumn("batch_id", F.lit(int(batch_id)))
        (row.write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.gauges_dir))
        # per-batch counts into the additive store (idempotent replay:
        # the batch partition overwrites its own prior attempt)
        (counts.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite").partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.state_dir))

    # -- readers ------------------------------------------------------
    def gauges(self, spark) -> DataFrame:
        """Per-batch drift history (empty-store safe)."""
        try:
            return spark.read.parquet(self.gauges_dir)
        except Exception:
            return spark.createDataFrame(
                [],
                "tokens_a bigint, tokens_b bigint, vocab_a bigint, "
                "vocab_b bigint, vocab_union bigint, "
                "vocab_jaccard double, js double, kl_ab double, "
                "kl_ba double, tv double, batch_id int",
            )

    def cumulative_counts(self, spark) -> DataFrame:
        """``(token, n)`` summed over every batch streamed so far."""
        state = self._state(spark)
        if state is None:
            return spark.createDataFrame([], "token string, n bigint")
        return state.groupBy("token").agg(F.sum("n").alias("n"))

    def cumulative_drift(self, spark) -> DataFrame:
        """Reference vs everything streamed so far — equals the batch
        ``corpus_drift(reference_docs, streamed_docs)`` for any
        micro-batching (token counts are additive)."""
        from ..operators.drift import drift_from_counts

        return drift_from_counts(
            self._ref(spark), self.cumulative_counts(spark),
            alpha=self.alpha,
        )
