"""Executable documentation: feature transforms, capability
introspection, and the Lemma-1 pruned assignment strategy.

Run standalone or via ``tests/test_examples.py``.
"""

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark import (
        GeneralizedKMeans, capabilities_for, feature_transforms as FT,
        get_kernel,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.select(
        F.array(
            "l_quantity", F.col("l_extendedprice") / 1e4,
            F.col("l_discount") * 10, F.col("l_tax") * 10,
        ).alias("features")
    )

    # 1. Kernel capability introspection drives preprocessing choices
    caps = capabilities_for("kl")
    transform = FT.recommended_transform(get_kernel("kl"))
    FT.validate_compatibility(get_kernel("kl"), transform)

    # 2. Apply the transform as a pure column expression, then fit
    prepared = transform.apply(df, "features", "prepped").select(
        F.col("prepped").alias("features")
    )
    kl_model = GeneralizedKMeans(
        k=3, divergence="kl", max_iter=5, seed=7, init_mode="random"
    ).fit(prepared)
    # centers mapped back to the original feature space
    original_space = [
        [round(float(v), 3) for v in transform.inverse_center(c)]
        for c in kl_model.centers
    ]

    # 3. Triangle-inequality pruned assignment with telemetry
    pruned_model = GeneralizedKMeans(
        k=8, divergence="se", max_iter=5, seed=42,
        assignment_strategy="pruned",
    ).fit(df)

    out = {
        "kl_caps": {
            "requires_positive": caps.requires_positive,
            "recommended_transform": transform.name,
        },
        "kl_centers_original_space_rows": len(original_space),
        "pruned_iterations": pruned_model.summary.iterations,
        "pruning_rate": round(pruned_model.summary.pruning_rate, 3),
    }
    print(out)
    return out


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = main(spark)
    spark.stop()
    assert out["kl_centers_original_space_rows"] == 3
    assert 0.0 < out["pruning_rate"] < 1.0
