"""Executable documentation: warm-start + streaming decay updates."""

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark.streaming.streaming_kmeans import (
        StreamingKMeans, StreamingKMeansModel,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    feats = li.select(
        F.array("l_quantity", (F.col("l_extendedprice") / 10_000.0))
        .alias("features")
    )

    # warm-start from a batch fit, then stream the rest with decay
    model = StreamingKMeans(
        k=4, half_life=5.0, seed=42, max_iter=5
    ).fit(feats.limit(1000))

    src = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()
    feats.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("features array<double>").parquet(src)
    q = model.create_streaming_updater(checkpoint_dir=ckpt).update_on(
        stream, trigger={"availableNow": True}
    )
    q.awaitTermination(180)

    # crash recovery: rebuild from the latest snapshot
    recovered = StreamingKMeansModel.read_snapshot(spark, ckpt)
    return {
        "batches": model.num_batches,
        "weights": [round(float(w), 1) for w in model.weights],
        "recovered_matches": bool(
            (recovered.centers == model.centers).all()
        ),
    }


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
    spark.stop()
