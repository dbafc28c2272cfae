"""applyInPandasWithState streaming sessionization."""

import datetime
import os

from generalized_kmeans_clustering_spark.streaming.stateful import (
    streaming_sessionize,
)


def test_streaming_sessionize_closes_gapped_sessions(spark, tmp_path):
    t0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = []
    # user 1: two sessions separated by 2 h; second session stays open
    for m in (0, 5, 10):
        rows.append((1, t0 + datetime.timedelta(minutes=m), 1.0))
    for m in (120, 125):
        rows.append((1, t0 + datetime.timedelta(minutes=m), 2.0))
    # user 2: one burst then silence (stays open, no emission)
    for m in (0, 1):
        rows.append((2, t0 + datetime.timedelta(minutes=m), 5.0))
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts timestamp, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    sessions = streaming_sessionize(stream, gap_minutes=30.0)
    q = (
        sessions.writeStream.format("memory").queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT * FROM sess_test ORDER BY user_id, session_start"
    ).collect()
    # only user 1's FIRST session closed (the 2 h gap); open sessions
    # wait for timeout/new data
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1
    assert r["n_events"] == 3
    assert r["sum_value"] == 3.0
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + datetime.timedelta(minutes=10)


def test_tumbling_rollup_plan_reused_in_streaming(spark, tmp_path):
    """The batch tumbling_rollup plan must run verbatim as a streaming
    query (readStream -> withWatermark -> tumbling_rollup -> complete
    sink) and agree with the batch result on the same files — the
    operator's docstring makes exactly this claim."""
    import datetime

    from pyspark.sql import functions as F

    from generalized_kmeans_clustering_spark.operators.rollup import (
        tumbling_rollup,
    )

    t0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (i, t0 + datetime.timedelta(minutes=17 * i % 180), "click" if i % 3 else "view",
         float(i % 7))
        for i in range(60)
    ]
    src = str(tmp_path / "ev_src")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).coalesce(1).write.parquet(src)

    batch = {
        (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
        for r in tumbling_rollup(
            spark.read.parquet(src), window="1 hour"
        ).collect()
    }

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(src)
        .withWatermark("ts", "1 hour")
    )
    q = (
        tumbling_rollup(stream, window="1 hour")
        .writeStream.format("memory").queryName("roll_mem")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["event_type"], r["window_start"]): (r["n"], r["sum_value"])
            for r in spark.sql("SELECT * FROM roll_mem").collect()
        }
    finally:
        q.stop()
    assert got == batch
