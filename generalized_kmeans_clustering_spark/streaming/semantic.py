"""Streaming SEMANTIC near-duplicate detection over embedding streams.

Engine extension: SemDeDup (``operators/semantic.py``) re-expressed
for Structured Streaming via ``foreachBatch`` with a persisted vector
state store — the semantic sibling of
:class:`~.dedup.StreamingNearDup`. Fixed coarse centroids (train them
once on a batch sample — model state) assign each arriving embedding
to a list MAP-ONLY; candidates are within-list only: the new batch
against itself plus the new batch against the accumulated store,
keyed on the list id — never all-pairs, exactly the batch operator's
shape, applied incrementally.

Emitted pairs are (i, j, sim) with cosine ≥ threshold; downstream
duplicate GROUPS come from running
:func:`~..operators.dedup.duplicate_components` over the accumulated
pairs table in a batch job (streaming connected components are not
attempted — component identity is global by nature).

State = one (id, list, vector) row per embedding seen; at 100 TB the
store is a big table but the join stays list-bucketed on both sides.
Batch parity: replaying a corpus through any micro-batching yields
exactly the batch :func:`~..operators.semantic.semantic_near_dup_pairs`
result for the same fixed centroids (the union over batches of
new-vs-new + new-vs-older candidates is the full within-list pair
set) — the oracle row replays documents as an availableNow stream and
compares value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["StreamingSemanticDedup"]


class StreamingSemanticDedup:
    """Incremental cross-batch semantic near-dup pair detection.

    Usage::

        sd = StreamingSemanticDedup(state_dir, pairs_dir,
                                    centers=model.centers.tolist(),
                                    threshold=0.95)
        q = (stream.writeStream.foreachBatch(sd.process_batch)
             .option("checkpointLocation", ckpt).start())

    Restart safety comes from the streaming checkpoint: a batch replay
    overwrites its own state/pairs partitions (idempotent per
    ``batch_id``) and excludes its own prior attempt from the
    "old" side, so no self-pairing on replay.
    """

    def __init__(self, state_dir: str, pairs_dir: str, centers,
                 threshold: float = 0.95, id_col: str = "vec_id",
                 vec_col: str = "embedding", where=None):
        if not centers:
            raise ValueError("StreamingSemanticDedup: empty centers")
        self.state_dir = state_dir
        self.pairs_dir = pairs_dir
        self.centers = [[float(x) for x in c] for c in centers]
        self.threshold = float(threshold)
        self.id_col = id_col
        self.vec_col = vec_col
        # candidate predicate (Column or SQL string over the stream's
        # columns), applied BEFORE assignment/bucketing — excluded rows
        # never enter the state store or any pair join (the r9 layer
        # convention shared with ivf_topk/knn_graph's ``where=``)
        self.where = where

    def _assign(self, df: DataFrame) -> DataFrame:
        from ..kmeans import GeneralizedKMeansModel

        model = GeneralizedKMeansModel(
            centers=self.centers, kernel_name="spherical",
            features_col="_v", prediction_col="_list",
        )
        staged = df.select(
            F.col(self.id_col).alias("_id"),
            F.col(self.vec_col).cast("array<double>").alias("_v"),
        )
        return model.transform(staged).select("_id", "_v", "_list")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..functions.kernels import dot
        from ..operators.similarity import _candidate_filter, _norm

        spark = batch_df.sparkSession
        new = self._assign(_candidate_filter(batch_df, self.where)) \
            .localCheckpoint(eager=True)
        try:
            # exclude this batch's own partition: a checkpoint replay
            # must not pair the previous attempt against itself
            old = spark.read.parquet(self.state_dir).where(
                F.col("batch_id") != int(batch_id))
        except Exception:
            old = None
        # norms as a post-checkpoint projection (NOT persisted — the
        # state-store schema stays (_id, _v, _list, batch_id)): the
        # pair join below fans each row out to every in-list partner,
        # so precomputing sqrt(v·v) per row leaves one dot product per
        # pair instead of three. dot/(l_nrm·r_nrm) is bit-identical to
        # cosine_sim (same operands, same multiplication order).
        newn = new.withColumn("_nrm", _norm(F.col("_v")))
        sides = [
            newn.alias("l").join(newn.alias("r"), "_list")
            .where(F.col("l._id") < F.col("r._id"))
        ]
        if old is not None:
            oldn = old.withColumn("_nrm", _norm(F.col("_v")))
            sides.append(newn.alias("l").join(oldn.alias("r"), "_list"))
        out = None
        for cand in sides:
            scored = cand.select(
                F.col("l._id").alias("i"), F.col("r._id").alias("j"),
                (dot(F.col("l._v"), F.col("r._v"))
                 / (F.col("l._nrm") * F.col("r._nrm"))).alias("sim"),
            ).where((F.col("i") != F.col("j"))
                    & (F.col("sim") >= self.threshold))
            out = scored if out is None else out.unionByName(scored)
        out = (
            out.select(
                F.least("i", "j").alias("i"),
                F.greatest("i", "j").alias("j"), "sim")
            .distinct()
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        (out.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.pairs_dir))
        (new.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.state_dir))

    def pairs(self, spark) -> DataFrame:
        """All confirmed semantic near-dup pairs so far (empty-store
        safe)."""
        try:
            return spark.read.parquet(self.pairs_dir)
        except Exception:
            return spark.createDataFrame(
                [], "i long, j long, sim double, batch_id int")
