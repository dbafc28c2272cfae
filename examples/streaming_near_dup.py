"""Executable documentation: LIVE near-duplicate detection on a
document stream.

Two shapes exist. ``streaming_lsh_pairs`` is the fully declarative
one — a watermarked stream-stream self-join of the banded signatures,
state evicted at the watermark, for when a bounded event-time dedup
horizon is acceptable. This example shows the OTHER shape: when pairs
must be found against ALL history (unbounded horizon, which no
watermarked join can express), the answer is ``foreachBatch``: per
micro-batch, MinHash-sign the batch (stateless fold), LSH-band-join it
against BOTH itself and the accumulated signature state store, verify
by estimated Jaccard, and append confirmed pairs. State = one
H·8-byte signature row per document ever seen — independent of text
size — and the band join stays bucketed on (band, bucket), never
all-pairs.

The same handler is checkpoint-replay idempotent (a replayed batch
overwrites its own pairs partition), so an availableNow backfill and a
continuous stream share this exact code path.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001",
         workdir: str | None = None) -> dict:
    import shutil
    import tempfile

    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    owns_workdir = workdir is None
    if owns_workdir:
        workdir = tempfile.mkdtemp(prefix="gkm_stream_nd_")
    src = f"{workdir}/incoming"

    # simulate an arriving corpus: split documents into two "days" of
    # files (a real deployment points readStream at the landing bucket)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    docs.where("doc_id % 2 = 0").write.mode("overwrite").parquet(src)
    docs.where("doc_id % 2 = 1").write.mode("append").parquet(src)

    nd = StreamingNearDup(
        state_dir=f"{workdir}/signatures",
        pairs_dir=f"{workdir}/pairs",
        num_hashes=32, num_bands=8, threshold=0.7,
    )
    # maxFilesPerTrigger forces MULTIPLE micro-batches out of the
    # already-landed files — without it, availableNow admits everything
    # into batch 0 and the accumulated-state join (the point of this
    # example) would never execute
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(nd.process_batch)
         .option("checkpointLocation", f"{workdir}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    pairs = nd.pairs(spark)
    n_pairs = pairs.count()
    # genuinely cross-BATCH pairs: endpoints whose signatures landed in
    # different micro-batches (arrival batch recorded in the state
    # store), i.e. pairs found through the accumulated state rather
    # than the within-batch self-join
    state = spark.read.parquet(nd.state_dir)
    arrival = state.select("doc_id", F.col("batch_id").alias("_ab"))
    n_cross = (
        pairs
        .join(arrival.withColumnRenamed("doc_id", "i")
              .withColumnRenamed("_ab", "_ai"), "i")
        .join(arrival.withColumnRenamed("doc_id", "j")
              .withColumnRenamed("_ab", "_aj"), "j")
        .where(F.col("_ai") != F.col("_aj")).count()
    )
    n_batches = state.select("batch_id").distinct().count()
    n_state = state.count()
    if owns_workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    return {
        "near_dup_pairs": n_pairs,
        "cross_batch_pairs": n_cross,
        "micro_batches": n_batches,
        "signatures_in_state": n_state,
        "docs": docs.count(),
    }


if __name__ == "__main__":
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    print(main(s))
