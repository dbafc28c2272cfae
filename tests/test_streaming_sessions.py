"""Watermarked streaming session rollup (streaming/sessions.py):
availableNow replay parity of the NATIVE session_window aggregation
with the batch session_rollup, including the terminal flush
(session_replay_flush) that recovers the sessions a bounded replay
holds open at end-of-stream."""

import datetime
import os
import shutil

from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.rollup import (
    session_rollup,
)
from generalized_kmeans_clustering_spark.streaming.sessions import (
    session_replay_flush, streaming_session_rollup,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = "user_id long, ts timestamp"


def _t(sec):
    return T0 + datetime.timedelta(seconds=sec)


def _replay(spark, tmp_path, files, name, gap_minutes):
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
    out = streaming_session_rollup(stream, gap_minutes=gap_minutes)
    q = (out.writeStream.format("memory").queryName(f"sess_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM sess_{name}")


def _keyed(df):
    return {(r["user_id"], r["session_start"]):
            (r["session_end"], r["n_events"]) for r in df.collect()}


def _flush_parity(spark, tmp_path, files, name, gap_minutes):
    """streamed ∪ flush == batch, disjointly; returns the three maps."""
    streamed = _replay(spark, tmp_path, files, name, gap_minutes)
    all_rows = [r for f in files for r in f]
    df = spark.createDataFrame(all_rows, SCHEMA)
    flushed = session_replay_flush(df, streamed, gap_minutes=gap_minutes)
    batch = session_rollup(df, gap_minutes=gap_minutes)
    s, fl, b = _keyed(streamed), _keyed(flushed), _keyed(batch)
    assert set(s) | set(fl) == set(b)
    assert not set(s) & set(fl)
    assert {**s, **fl} == b
    return s, fl, b


def test_session_replay_flush_holds_trailing_sessions(spark, tmp_path):
    """Matured sessions stream out; the session containing the final
    event is always held (its end = last event + gap exceeds the
    terminal watermark) and comes back via the flush."""
    gap = 1.0  # minute
    f0 = [(1, _t(0)), (1, _t(30)),            # u1 session A
          (2, _t(10))]                        # u2 session A
    f1 = [(1, _t(300)), (2, _t(310)),         # both users: session B
          (1, _t(330))]
    s, fl, b = _flush_parity(spark, tmp_path, [f0, f1], "trail", gap)
    # u1 session A matured (watermark reached 330s > 30+60s): streamed
    assert (1, _t(0)) in s and s[(1, _t(0))] == (_t(30 + 60), 2)
    assert (2, _t(10)) in s
    # both trailing sessions held and flushed with exact batch rows
    assert set(fl) == {(1, _t(300)), (2, _t(310))}
    assert fl[(1, _t(300))] == (_t(330 + 60), 2)
    assert fl[(2, _t(310))] == (_t(310 + 60), 1)


def test_session_merges_across_microbatches(spark, tmp_path):
    """A session whose events straddle the file boundary merges in the
    state store (the native-operator behavior the wrapper inherits):
    one batch-identical row, not two fragments."""
    gap = 1.0
    f0 = [(7, _t(0)), (7, _t(40))]
    f1 = [(7, _t(70)),                        # extends (70-40 < 60s)
          (7, _t(500)), (9, _t(500))]         # new sessions, held
    s, fl, b = _flush_parity(spark, tmp_path, [f0, f1], "merge", gap)
    assert (7, _t(0)) in s                    # merged, then matured
    assert s[(7, _t(0))] == (_t(70 + 60), 3)
    assert set(fl) == {(7, _t(500)), (9, _t(500))}


def test_session_gap_boundary_is_inclusive(spark, tmp_path):
    """Spark's merge rule is boundary-INCLUSIVE: a delta of exactly
    gap still extends the session (the windows [t, t+gap) and
    [t+gap, …) touch, and Spark merges on start <= current end); only
    a delta strictly greater than gap starts a new one. This pin
    exposed — and the r11 SQL-twin fix closed — a `>= gap` split rule
    in the oracle that real microsecond data never hit."""
    gap = 1.0
    f0 = [(3, _t(0)), (3, _t(60))]            # delta == gap: MERGES
    f1 = [(3, _t(60 + 61)),                   # delta > gap: splits
          (3, _t(1000))]
    s, fl, b = _flush_parity(spark, tmp_path, [f0, f1], "bound", gap)
    assert (3, _t(0)) in b and b[(3, _t(0))] == (_t(60 + 60), 2)
    assert (3, _t(121)) in b and b[(3, _t(121))] == (_t(121 + 60), 1)
    assert set(b) == set(s) | set(fl) and len(b) == 3


def test_streaming_matches_batch_on_events_slice(spark, sf_dir):
    """End-to-end on the real events table (user_id < 30, one file =
    one batch after a median time split): streamed ∪ flush equals the
    batch session_rollup row set exactly."""
    import __spark_entry__ as em

    ev = em.events(spark, sf_dir).where(F.col("user_id") < 30) \
        .select("user_id", "ts")
    import tempfile

    root = tempfile.mkdtemp(prefix="gkm_sess_test_")
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
        out = streaming_session_rollup(stream, gap_minutes=60.0)
        q = (out.writeStream.format("memory").queryName("sess_events")
             .outputMode("append")
             .option("checkpointLocation", f"{root}/ck")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        streamed = spark.sql("SELECT * FROM sess_events")
        flushed = session_replay_flush(ev, streamed, gap_minutes=60.0)
        s, fl = _keyed(streamed), _keyed(flushed)
        b = _keyed(session_rollup(ev, gap_minutes=60.0))
        assert fl, "terminal sessions must be held by the replay"
        assert set(s) | set(fl) == set(b) and not set(s) & set(fl)
        assert {**s, **fl} == b
    finally:
        shutil.rmtree(root, ignore_errors=True)
