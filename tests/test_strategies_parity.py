"""Assignment-strategy parity + VectorUDT interop + watermarked windows.

Mirrors the reference's ``df/AssignmentStrategiesSuite.scala``: every
strategy must produce identical assignments on identical inputs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import GeneralizedKMeans
from generalized_kmeans_clustering_spark.functions.kernels import get_kernel
from generalized_kmeans_clustering_spark.operators.assignment import (
    ExpressionAssignment, ChunkedExpressionAssignment, PandasAssignment,
    CrossJoinAssignment,
)


@pytest.fixture(scope="module")
def pts_df(spark):
    rng = np.random.default_rng(161)
    pts = rng.normal(0, 5, (200, 3))
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(pts)],
        "id long, features array<double>",
    )
    return df.cache(), pts


CENTERS = [[0.0, 0.0, 0.0], [5.0, 5.0, 0.0], [-5.0, 0.0, 5.0],
           [0.0, -5.0, -5.0], [3.0, -3.0, 3.0]]


@pytest.mark.parametrize("divergence", ["squaredEuclidean", "l1"])
def test_all_strategies_agree(spark, pts_df, divergence):
    df, _ = pts_df
    kernel = get_kernel(divergence)
    strategies = [
        ExpressionAssignment(),
        ChunkedExpressionAssignment(chunk_size=2),  # forces multi-chunk
        PandasAssignment(),
        CrossJoinAssignment(),
    ]
    results = []
    for s in strategies:
        out = s.assign(df, kernel, CENTERS, "features")
        rows = {r["id"]: (r["_cluster"], round(r["_dist"], 9))
                for r in out.select("id", "_cluster", "_dist").collect()}
        results.append((s.name, rows))
    base_name, base = results[0]
    for name, rows in results[1:]:
        assert rows == base, f"{name} differs from {base_name}"


def test_vector_udt_interop(spark, pts_df):
    """VectorUDT features accepted at the API boundary (SURVEY §7.3.6)."""
    from pyspark.ml.linalg import Vectors

    df, pts = pts_df
    vec_df = spark.createDataFrame(
        [(Vectors.dense([float(v) for v in row]),) for row in pts[:50]],
        ["features"],
    )
    m = GeneralizedKMeans(k=3, seed=5, max_iter=5).fit(vec_df)
    out = m.transform(vec_df)
    assert out.count() == 50
    assert out.select("prediction").distinct().count() <= 3
    # sparse vectors densify through the same boundary
    sv_df = spark.createDataFrame(
        [(Vectors.sparse(3, [0], [1.0]),), (Vectors.sparse(3, [2], [9.0]),)],
        ["features"],
    )
    m2 = GeneralizedKMeans(k=2, seed=5, max_iter=3, init_mode="random").fit(sv_df)
    assert m2.dim == 3


def test_summary_restored_on_load(spark, pts_df, tmp_path):
    from generalized_kmeans_clustering_spark.persistence import load_model

    df, _ = pts_df
    m = GeneralizedKMeans(k=3, seed=7, max_iter=6).fit(df)
    path = str(tmp_path / "with_summary")
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert m2.summary is not None
    assert m2.summary.iterations == m.summary.iterations
    assert m2.summary.distortion_history == m.summary.distortion_history


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    """tumbling_rollup's F.window plan runs unchanged under a
    watermarked stream (late-data-capable event-time aggregation)."""
    import datetime, os

    from generalized_kmeans_clustering_spark.operators.rollup import (
        tumbling_rollup,
    )

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    t0 = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(minutes=7 * i), i % 3,
         "click" if i % 2 else "view", float(i), None)
        for i in range(40)
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = tumbling_rollup(stream.withWatermark("ts", "10 minutes"))
    q = (
        agg.writeStream.format("memory").queryName("rollup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM rollup_test").collect()
    # append mode emits only windows sealed by the watermark
    assert len(got) > 0
    assert {r["event_type"] for r in got} <= {"click", "view"}
    assert all(r["n"] >= 1 for r in got)
