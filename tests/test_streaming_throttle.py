"""Watermarked streaming throttle (streaming/throttle.py): native
windowed min_by replay parity with the batch throttle_events,
including the terminal flush for a bounded replay's trailing windows."""

import datetime
import os
import shutil

from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.rollup import (
    throttle_events,
)
from generalized_kmeans_clustering_spark.streaming.throttle import (
    streaming_throttle, throttle_replay_flush,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = "event_id long, user_id long, event_type string, ts timestamp"


def _t(sec):
    return T0 + datetime.timedelta(seconds=sec)


def _replay(spark, tmp_path, files, name, **kw):
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"tmp_{name}_{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_throttle(stream, **kw)
    q = (out.writeStream.format("memory").queryName(f"thr_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM thr_{name}")


def _ids(df):
    return {r["event_id"] for r in df.collect()}


def _flush_parity(spark, tmp_path, files, name, **kw):
    streamed = _replay(spark, tmp_path, files, name, **kw)
    all_rows = [r for f in files for r in f]
    df = spark.createDataFrame(all_rows, SCHEMA)
    flushed = throttle_replay_flush(df, streamed, **kw)
    batch = throttle_events(
        df, kw.get("entity_cols", ("user_id", "event_type")),
        kw.get("ts_col", "ts"), kw.get("window_seconds", 60.0),
        kw.get("tiebreak_col"))
    s, fl, b = _ids(streamed), _ids(flushed), _ids(batch)
    assert s | fl == b
    assert not s & fl
    return s, fl, b


def test_throttle_earliest_wins_and_trailing_window_flushes(
        spark, tmp_path):
    """Within a window the earliest event (event_id tiebreak) streams
    out once the window matures; the replay's final window is always
    held and recovered by the flush."""
    f0 = [(1, 1, "click", _t(5)), (2, 1, "click", _t(20)),   # w0: keep 1
          (3, 2, "click", _t(5))]                            # w0: keep 3
    f1 = [(4, 1, "click", _t(70)),                           # w1: keep 4
          (5, 1, "click", _t(200)), (6, 1, "click", _t(190))]  # w3: keep 6
    s, fl, b = _flush_parity(
        spark, tmp_path, [f0, f1], "basic",
        entity_cols=("user_id", "event_type"), window_seconds=60.0,
        tiebreak_col="event_id")
    assert b == {1, 3, 4, 6}
    # windows [0,60) and [60,120) matured (watermark hit 200s); the
    # final window [180,240) is held and flushed
    assert s == {1, 3, 4} and fl == {6}


def test_throttle_tie_on_min_ts_resolves_by_tiebreak(spark, tmp_path):
    """Two events at the identical minimum timestamp: the least
    event_id wins, matching the batch row_number order exactly."""
    f0 = [(9, 5, "view", _t(10)), (8, 5, "view", _t(10)),
          (7, 5, "view", _t(30))]
    f1 = [(10, 5, "view", _t(500))]
    s, fl, b = _flush_parity(
        spark, tmp_path, [f0, f1], "tie",
        entity_cols=("user_id", "event_type"), window_seconds=60.0,
        tiebreak_col="event_id")
    assert b == {8, 10}
    assert s == {8} and fl == {10}


def test_throttle_window_grid_is_epoch_aligned(spark, tmp_path):
    """An event at exactly the window boundary belongs to the NEXT
    bucket on both sides (batch floor grid == streaming F.window
    grid), so it is kept separately, not deduped into the first."""
    f0 = [(1, 3, "x", _t(0)), (2, 3, "x", _t(60))]   # boundary: 2 kept
    f1 = [(3, 3, "x", _t(1000))]
    s, fl, b = _flush_parity(
        spark, tmp_path, [f0, f1], "grid",
        entity_cols=("user_id", "event_type"), window_seconds=60.0,
        tiebreak_col="event_id")
    assert b == {1, 2, 3}


def test_streaming_throttle_matches_batch_on_events_slice(spark, sf_dir):
    """End-to-end on the real events table (user_id < 30, hourly
    windows): streamed ∪ flush equals batch throttle_events exactly,
    with a non-empty flush leg."""
    import tempfile

    import __spark_entry__ as em

    ev = em.events(spark, sf_dir).where(F.col("user_id") < 30).select(
        "event_id", "user_id", "event_type", "ts")
    kw = dict(entity_cols=("user_id", "event_type"), ts_col="ts",
              window_seconds=3600.0, tiebreak_col="event_id")
    root = tempfile.mkdtemp(prefix="gkm_thr_test_")
    try:
        tus = F.unix_micros(F.col("ts").cast("timestamp"))
        med = ev.select(tus.alias("_t")).approxQuantile("_t", [0.5], 0.0)[0]
        src = f"{root}/in"
        os.makedirs(src, exist_ok=True)
        for i, half in enumerate((ev.where(tus <= F.lit(int(med))),
                                  ev.where(tus > F.lit(int(med))))):
            tmp = f"{root}/tmp{i}"
            half.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = [f for f in os.listdir(tmp)
                    if f.endswith(".parquet")][0]
            shutil.copy(f"{tmp}/{part}", f"{src}/{i:02d}.parquet")
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_throttle(stream, **kw)
        q = (out.writeStream.format("memory").queryName("thr_events")
             .outputMode("append")
             .option("checkpointLocation", f"{root}/ck")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        streamed = spark.sql("SELECT * FROM thr_events")
        flushed = throttle_replay_flush(ev, streamed, **kw)
        s, fl = _ids(streamed), _ids(flushed)
        b = _ids(throttle_events(ev, ("user_id", "event_type"), "ts",
                                 3600.0, "event_id"))
        assert fl, "trailing windows must be held by the replay"
        assert s | fl == b and not s & fl
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_throttle_fractional_window_shares_one_grid(spark, tmp_path):
    """window_seconds=8.2: float(8.2)*1e6 = 8_199_999.999…, so a
    truncating grid (8_199_999 µs) and a rounding grid (8_200_000 µs)
    tile DIFFERENT buckets near multiples of 8.2 s. Batch and streaming
    now share one rounded helper (rollup.throttle_grid_us), so the
    streamed ∪ flush == batch contract must hold bit-exactly — the
    regression test for the r11 advisor's grid-mismatch finding."""
    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_grid_us,
    )

    assert throttle_grid_us(8.2) == 8_200_000
    # events straddling the 10th boundary (82.0 s) where the truncated
    # grid (bucket = floor(82_000_000 / 8_199_999) = 10) and the rounded
    # grid (floor(82_000_000 / 8_200_000) = 10) agree, plus events just
    # under it where they differ: 81_999_999 µs → trunc bucket 10,
    # rounded bucket 9.
    f0 = [(1, 1, "x", _t(0)), (2, 1, "x", _t(5)),            # bucket 0
          (3, 1, "x", T0 + datetime.timedelta(microseconds=81_999_990)),
          (4, 1, "x", _t(82))]                               # bucket 10
    f1 = [(5, 1, "x", _t(500))]
    s, fl, b = _flush_parity(
        spark, tmp_path, [f0, f1], "frac",
        entity_cols=("user_id", "event_type"), window_seconds=8.2,
        tiebreak_col="event_id")
    # rounded grid: event 3 (81.99999 s) is in bucket 9, event 4 (82 s)
    # opens bucket 10 — both kept; with the old mismatch the flush
    # anti-join keyed different buckets and duplicated/dropped rows.
    assert b == {1, 3, 4, 5}
