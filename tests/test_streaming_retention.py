"""Watermarked streaming retention (streaming/retention.py): pure
core, availableNow parity with batch retention_cohorts, max_offset."""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.rollup import (
    retention_cohorts,
)
from generalized_kmeans_clustering_spark.streaming.retention import (
    _retention_step, streaming_retention,
)

T0 = datetime.datetime(2024, 5, 6, 0, 0, 0)  # a Monday


def _us(days):
    return int((T0 + datetime.timedelta(days=days)).timestamp() * 1e6)


def test_retention_step_first_touch_and_eviction():
    # weekly mixes: week index = Monday's days-since-epoch // 7
    def row(d):
        dt = (T0 + datetime.timedelta(days=d)).date()
        monday = dt - datetime.timedelta(days=dt.weekday())
        bucket_us = int(datetime.datetime.combine(
            monday, datetime.time()).timestamp() * 1e6)
        days = (monday - datetime.date(1970, 1, 1)).days
        return (_us(d), bucket_us, days // 7)

    buf = [row(8), row(0), row(9), row(21)]  # wk1, wk0, wk1 dup, wk3
    wm = _us(10) // 1000
    emits, keep, cohort, cmix, seen = _retention_step(
        buf, None, None, set(), wm, None)
    # cohort fixed by the EARLIEST mature event; wk1 emitted once
    assert [o for _, o in emits] == [0, 1]
    assert all(c == cohort for c, _ in emits)
    assert keep == [row(21)]                 # immature survives, rest evicted
    emits2, keep2, *_ = _retention_step(
        keep, cohort, cmix, seen, _us(30) // 1000, None)
    assert [o for _, o in emits2] == [3] and keep2 == []
    # max_offset trims without polluting seen
    emits3, _, _, _, seen3 = _retention_step(
        [row(70)], cohort, cmix, seen, _us(99) // 1000, max_offset=5)
    assert emits3 == [] and 10 not in seen3


def _replay(spark, tmp_path, files, name, **kw):
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts timestamp"
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"tmp_{name}_{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_retention(stream, **kw)
    q = (out.writeStream.format("memory").queryName(f"ret_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM ret_{name}").collect()


def test_streaming_retention_matches_batch(spark, tmp_path):
    import random

    rng = random.Random(9)
    rows = []
    for u in range(30):
        d = rng.randint(0, 6)
        for _ in range(rng.randint(1, 12)):
            rows.append((u, T0 + datetime.timedelta(
                days=d, hours=rng.randint(0, 23))))
            d += rng.randint(0, 20)
    rows.sort(key=lambda r: r[1])
    half = len(rows) // 2
    got = _replay(spark, tmp_path, [rows[:half], rows[half:]], "parity",
                  period="week")
    # aggregate the first-activity stream into the retention matrix
    pairs = spark.createDataFrame(
        [(r["user_id"], r["cohort"], r["offset"]) for r in got],
        "user_id long, cohort timestamp, offset int")
    assert pairs.count() == pairs.distinct().count()  # exactly-once
    agg = {(r["cohort"], r["offset"]): r["n"] for r in
           pairs.groupBy("cohort", "offset")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    exp = {(r["cohort"], r["offset"]): r["n_active"] for r in
           retention_cohorts(df, "user_id", "ts", period="week").collect()}
    assert agg == exp


def test_streaming_retention_month_and_max_offset(spark, tmp_path):
    rows = [
        (1, T0),
        (1, T0 + datetime.timedelta(days=40)),    # month offset 1
        (1, T0 + datetime.timedelta(days=400)),   # offset 13 > cap
        (1, T0 + datetime.timedelta(days=430)),   # advances watermark
    ]
    got = _replay(spark, tmp_path, [rows], "cap", period="month",
                  max_offset=12)
    offs = sorted(r["offset"] for r in got)
    assert offs == [0, 1]


def test_streaming_retention_negative_cohort_bucket(spark, tmp_path):
    """A NEGATIVE cohort bucket must persist across micro-batches.
    Reachable with post-epoch events (pre-epoch event times never pass
    Spark's initial watermark of 0): the ISO week of 1970-01-01..04
    truncates to Monday 1969-12-29, a negative unix_micros bucket. The
    state carries an explicit has-cohort flag, so that cohort is not
    mistaken for 'no cohort yet' and silently re-fixed to the next
    mature event (which would shift every later offset)."""
    def d(day):
        return datetime.datetime(1970, 1, day)

    rows1 = [(1, d(2)), (1, d(3))]                 # cohort wk 1969-12-29
    rows2 = [(1, d(10)), (1, d(20))]               # offsets 1 and 3
    got = _replay(spark, tmp_path, [rows1, rows2], "negcohort",
                  period="week")
    offs = sorted(r["offset"] for r in got)
    assert offs == [0, 1, 3]
    assert all(r["cohort"] == datetime.datetime(1969, 12, 29)
               for r in got)                       # cohort never re-fixed


def test_streaming_retention_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    spark.createDataFrame([], "user_id long, ts timestamp") \
        .write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp") \
        .parquet(src)
    with pytest.raises(ValueError, match="period"):
        streaming_retention(stream, period="year")
    with pytest.raises(ValueError, match="missing"):
        streaming_retention(stream, entity_col="nope")


def test_retention_replay_flush_recovers_terminal_ms(spark, tmp_path):
    """Flush contract (r10): streamed ∪ retention_replay_flush ==
    retention_pairs, disjointly — including a first-activity row held
    in the stream's terminal watermark millisecond (the maturity
    boundary Spark's strict timeout < watermark rule never fires)."""
    from generalized_kmeans_clustering_spark.operators.rollup import (
        retention_pairs,
    )
    from generalized_kmeans_clustering_spark.streaming.retention import (
        retention_replay_flush,
    )

    ms = datetime.timedelta(milliseconds=1)
    base = [
        (1, T0),
        (1, T0 + datetime.timedelta(days=8)),
        (2, T0 + datetime.timedelta(days=1)),
    ]
    # user 2's week-1 activity is the global max event time: its
    # maturity ms equals the terminal watermark ms -> held
    edge = [(2, T0 + datetime.timedelta(days=8) + ms)]
    got = _replay(spark, tmp_path, [base, edge], "flush_edge",
                  period="week")
    streamed = spark.createDataFrame(
        [(r["user_id"], r["cohort"], r["offset"]) for r in got],
        "user_id long, cohort timestamp, offset int")
    df = spark.createDataFrame(base + edge, "user_id long, ts timestamp")
    flushed = retention_replay_flush(df, streamed, "user_id", "ts",
                                     period="week")
    batch = retention_pairs(df, "user_id", "ts", period="week")

    def keyed(frame):
        return {(r["user_id"], r["offset"]): r["cohort"]
                for r in frame.collect()}

    s, fl, b = keyed(streamed), keyed(flushed), keyed(batch)
    assert (2, 1) in fl                    # the held terminal-ms row
    assert not set(s) & set(fl)
    assert {**s, **fl} == b
