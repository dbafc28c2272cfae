"""Executable documentation: fit, inspect, persist, reload.

Mirrors the reference's runnable examples
(``src/main/scala/examples/PersistenceRoundTrip*.scala`` asserted by
``ExamplesSuite`` — "executable documentation", ``README.md:124``).
Run standalone or via ``tests/test_examples.py``.
"""

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark import (
        GeneralizedKMeans, evaluate,
    )
    from generalized_kmeans_clustering_spark.persistence import load_model

    # 1. features: any array<double> column works
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = lineitem.select(
        F.array(
            "l_quantity",
            (F.col("l_extendedprice") / 10_000.0),
            (F.col("l_discount") * 10.0),
        ).alias("features")
    )

    # 2. fit with a KL divergence (features are non-negative)
    model = GeneralizedKMeans(
        k=5, divergence="kl", max_iter=10, seed=42, distance_col="dist"
    ).fit(df)

    # 3. inspect: summary + quality metrics in one pass
    metrics = evaluate(model, df)

    # 4. persist + reload: identical transforms guaranteed by checksum
    path = tempfile.mkdtemp() + "/model"
    model.save(spark, path)
    reloaded = load_model(spark, path)
    n = reloaded.transform(df).where(F.col("prediction") >= 0).count()

    return {
        "k": model.k,
        "iterations": model.summary.iterations,
        "wcss": metrics["wcss"],
        "silhouette": metrics["silhouette"],
        "rows_scored": n,
    }


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    print(out)
    spark.stop()
