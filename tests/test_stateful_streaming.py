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
