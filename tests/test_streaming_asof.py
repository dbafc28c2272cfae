"""Watermarked streaming as-of join (streaming/asof.py): state-core
eviction semantics, availableNow batch parity, late-data drop."""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.temporal import asof_join
from generalized_kmeans_clustering_spark.streaming.asof import (
    _asof_step, streaming_asof_join,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)


def _us(sec):
    return int((T0 + datetime.timedelta(seconds=sec)).timestamp() * 1e6)


def test_asof_step_emits_and_evicts():
    # buffer: rights at 10s/20s, lefts at 15s/25s; watermark at 20s
    buf = [
        (_us(15), 1, 100, None),
        (_us(10), 0, None, 1.0),
        (_us(25), 1, 101, None),
        (_us(20), 0, None, 2.0),
    ]
    wm_ms = _us(20) // 1000
    emits, keep, fts, fv = _asof_step(buf, None, None, wm_ms)
    # left@15 matched right@10; left@25 immature
    assert emits == [(100, _us(15), 1.0, _us(10))]
    # EVICTION: matured rows are gone; only the immature left remains
    assert keep == [(_us(25), 1, 101, None)]
    # floor = latest mature right (right@20), carried for future lefts
    assert (fts, fv) == (_us(20), 2.0)
    # next round: watermark passes everything -> left@25 matches floor
    emits, keep, fts, fv = _asof_step(keep, fts, fv, _us(30) // 1000)
    assert emits == [(101, _us(25), 2.0, _us(20))]
    assert keep == [] and (fts, fv) == (_us(20), 2.0)


def test_asof_step_equal_ts_inclusive_and_right_ties():
    # right at the SAME instant as left matches (inclusive backward);
    # right ties at one ts resolve to the greatest value
    buf = [
        (_us(5), 1, 7, None),
        (_us(5), 0, None, 3.0),
        (_us(5), 0, None, 9.0),
    ]
    emits, keep, fts, fv = _asof_step(buf, None, None, _us(5) // 1000)
    assert emits == [(7, _us(5), 9.0, _us(5))]
    assert keep == []


def _run_stream(spark, tmp_path, files, name, delay="0 seconds",
                tolerance_seconds=None):
    """Replay time-split parquet files (in list order) through the
    streaming as-of join into a memory sink; returns collected rows."""
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    schema = ("user_id long, ts timestamp, event_id long, value double,"
              " is_left int")
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"tmp_{name}_{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part), os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_asof_join(
        stream.where(F.col("is_left") == 1),
        stream.where(F.col("is_left") == 0),
        "user_id", "ts", "event_id", "value",
        delay=delay, tolerance_seconds=tolerance_seconds)
    q = (out.writeStream.format("memory").queryName(f"asof_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(
        f"SELECT * FROM asof_{name} ORDER BY event_id").collect()


def test_streaming_asof_matches_batch(spark, tmp_path):
    # interleaved lefts/rights for 3 users, split into 2 time-ordered
    # files; parity must hold for this micro-batching
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for s in range(0, 600, 45):          # rights every 45s
            rows.append((u, T0 + datetime.timedelta(seconds=s + u), None,
                         float(u * 1000 + s), 0))
        for s in range(10, 600, 70):         # lefts every 70s
            rows.append((u, T0 + datetime.timedelta(seconds=s + 2 * u),
                         eid, None, 1))
            eid += 1
    rows.sort(key=lambda r: r[1])
    half = len(rows) // 2
    got = _run_stream(spark, tmp_path, [rows[:half], rows[half:]], "parity")

    schema = ("user_id long, ts timestamp, event_id long, value double,"
              " is_left int")
    df = spark.createDataFrame(rows, schema)
    exp = asof_join(
        df.where("is_left = 1").select("user_id", "ts", "event_id"),
        df.where("is_left = 0").select("user_id", "ts", "value"),
        "user_id", "ts", "ts", ["value"],
    ).collect()
    exp_m = {r["event_id"]: (r["value"], r["matched_ts"]) for r in exp}
    got_m = {r["event_id"]: (r["matched_value"], r["matched_ts"])
             for r in got}
    assert got_m == exp_m
    assert len(got_m) == eid  # every left row emitted exactly once


def test_streaming_asof_tolerance_and_unmatched(spark, tmp_path):
    rows = [
        (1, T0, None, 5.0, 0),                                   # right @0
        (1, T0 + datetime.timedelta(seconds=10), 0, None, 1),    # left @10
        (1, T0 + datetime.timedelta(seconds=500), 1, None, 1),   # left @500
        (2, T0 + datetime.timedelta(seconds=20), 2, None, 1),    # no right
        (2, T0 + datetime.timedelta(seconds=600), None, 1.0, 0),
    ]
    got = _run_stream(spark, tmp_path, [rows], "tol",
                      tolerance_seconds=60.0)
    m = {r["event_id"]: (r["matched_value"], r["matched_ts"]) for r in got}
    assert m[0] == (5.0, T0)
    assert m[1] == (None, None)      # match older than tolerance voided
    assert m[2] == (None, None)      # never any right for user 2


def test_streaming_asof_drops_late_right(spark, tmp_path):
    """A right row arriving AFTER the watermark passed its event time
    must not rewrite history: with delay=0 the watermark after file 1
    sits at file 1's max event time, so file 2's stale right (event
    time 0s) is late and dropped — the left in file 2 still matches
    the in-order right."""
    f1 = [
        (1, T0 + datetime.timedelta(seconds=100), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=110), 0, None, 1),
    ]
    f2 = [
        (1, T0, None, 99.0, 0),                                  # LATE
        (1, T0 + datetime.timedelta(seconds=120), 1, None, 1),
    ]
    got = _run_stream(spark, tmp_path, [f1, f2], "late")
    m = {r["event_id"]: r["matched_value"] for r in got}
    # both lefts match the legit right@100; the late 99.0 never lands
    assert m == {0: 7.0, 1: 7.0}


def test_streaming_asof_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    schema = "user_id long, ts timestamp, event_id long, value double"
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="missing"):
        streaming_asof_join(stream, stream, "user_id", "ts", "nope",
                            "value")
    with pytest.raises(ValueError, match="integral"):
        streaming_asof_join(
            stream.withColumn("sid", F.lit("x")), stream,
            "user_id", "ts", "sid", "value")
