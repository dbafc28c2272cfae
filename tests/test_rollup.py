"""Unit tests for event rollups and TF-IDF operators."""

import datetime

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.rollup import (
    tumbling_rollup, sessionize, top_k_by_count, json_prop,
)
from generalized_kmeans_clustering_spark.operators.text_features import (
    term_counts, tfidf, top_terms_per_doc,
)


@pytest.fixture(scope="module")
def ev(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10, "click", 1.0, '{"k": 5}'),
        (2, t0 + datetime.timedelta(minutes=10), 10, "click", 2.0, '{"k": 6}'),
        (3, t0 + datetime.timedelta(hours=2), 10, "click", 3.0, None),
        (4, t0 + datetime.timedelta(minutes=5), 20, "view", 4.0, '{"k": 7}'),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).cache()


def test_tumbling_rollup_buckets(spark, ev):
    out = {(r["event_type"], r["window_start"].hour): (r["n"], r["sum_value"])
           for r in tumbling_rollup(ev).collect()}
    assert out[("click", 0)] == (2, 3.0)
    assert out[("click", 2)] == (1, 3.0)
    assert out[("view", 0)] == (1, 4.0)


def test_sessionize_gap(spark, ev):
    out = sessionize(ev, gap_minutes=30.0).orderBy("event_id").collect()
    sid = {r["event_id"]: r["session_id"] for r in out}
    assert sid[1] == sid[2] == 1   # 10 min apart → same session
    assert sid[3] == 2             # 2 h later → new session
    assert sid[4] == 1             # other user restarts at 1


def test_sessionize_timestamp_ntz(spark, ev, tmp_path):
    """Regression: parquet written as timestamp[us] without a timezone
    loads back as TIMESTAMP_NTZ; sessionize must still resolve (r2's
    only red CORRECTNESS row came from unix_micros rejecting NTZ)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(
            [t0, t0 + datetime.timedelta(minutes=10),
             t0 + datetime.timedelta(hours=2)],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([10, 10, 10], pa.int64()),
    })
    path = str(tmp_path / "ntz_events.parquet")
    pq.write_table(tbl, path)
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    out = sessionize(df, gap_minutes=30.0).orderBy("event_id").collect()
    assert [r["session_id"] for r in out] == [1, 1, 2]


def test_top_k_by_count(spark, ev):
    out = top_k_by_count(ev, k=1).collect()
    top = {r["event_type"]: r["user_id"] for r in out}
    assert top["click"] == 10
    assert top["view"] == 20


def test_json_prop(spark, ev):
    out = ev.select("event_id", json_prop(F.col("props"), "k", "int").alias("pk")) \
        .orderBy("event_id").collect()
    assert [r["pk"] for r in out] == [5, 6, None, 7]


def test_tfidf_math(spark):
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a c")], "doc_id long, text string"
    )
    import math

    rows = {(r["doc_id"], r["term"]): r for r in tfidf(df).collect()}
    assert rows[(0, "a")]["tf"] == 2
    assert rows[(0, "a")]["df"] == 2
    # idf('a') = ln(3/3)+1 = 1 → tfidf = 2; idf('b') = ln(3/2)+1
    assert rows[(0, "a")]["tfidf"] == pytest.approx(2.0)
    assert rows[(0, "b")]["tfidf"] == pytest.approx(math.log(3 / 2) + 1)
    top = top_terms_per_doc(df, k=1).orderBy("doc_id").collect()
    assert [r["term"] for r in top] == ["a", "c"]  # b < a in doc0 by tfidf


def test_session_rollup_native_window(spark):
    import datetime as dt

    from generalized_kmeans_clustering_spark.operators.rollup import (
        session_rollup, sessionize,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=10)),      # session A
        (1, t0 + dt.timedelta(minutes=50)),               # session B (gap 40 > 30)
        (2, t0), (2, t0 + dt.timedelta(minutes=29)),      # one session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_rollup(df, gap_minutes=30.0).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert len(by_user[2]) == 1
    a = sorted(by_user[1], key=lambda r: r["session_start"])[0]
    assert a["n_events"] == 2
    assert a["session_start"] == t0
    # end = last event + gap
    assert a["session_end"] == t0 + dt.timedelta(minutes=40)
    assert by_user[2][0]["n_events"] == 2


def test_session_rollup_runs_as_stream(spark, tmp_path):
    """The identical plan runs as a streaming stateful aggregation."""
    import datetime as dt
    import os

    from generalized_kmeans_clustering_spark.operators.rollup import (
        session_rollup,
    )

    src = str(tmp_path / "sess_src")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(1, t0), (1, t0 + dt.timedelta(minutes=5)),
            (2, t0 + dt.timedelta(minutes=1))]
    spark.createDataFrame(rows, "user_id long, ts timestamp") \
        .write.mode("overwrite").parquet(src)
    out_dir = str(tmp_path / "sess_out")

    def run_once():
        stream = spark.readStream.schema(
            "user_id long, ts timestamp").parquet(src)
        agg = session_rollup(
            stream.withWatermark("ts", "1 hour"), gap_minutes=30.0)
        q = (agg.writeStream.format("parquet")
             .outputMode("append").option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    # append mode emits only watermark-CLOSED sessions; the watermark
    # never passes the last event's session in the first run, so a
    # later flush event (next micro-batch, same checkpoint) advances
    # it and releases the earlier sessions
    spark.createDataFrame(
        [(99, t0 + dt.timedelta(hours=3))], "user_id long, ts timestamp"
    ).write.mode("append").parquet(src)
    run_once()
    got = spark.read.parquet(out_dir).collect()
    assert {(r["user_id"], r["n_events"]) for r in got} >= {(1, 2), (2, 1)}


def test_session_gap_microsecond_precision(spark):
    """r11 advisor finding: session_rollup used to truncate the gap to
    whole seconds while the SQL oracle kept microsecond precision —
    sub-second-granularity gaps disagreed. Both now share
    session_gap_us: gap_minutes=0.5083 = 30.498 s exactly (not 30 s),
    so a 30.4 s delta MERGES and a 30.6 s delta SPLITS, and session_end
    = last event + the µs-precise gap."""
    import datetime as dt

    from generalized_kmeans_clustering_spark.operators.rollup import (
        session_gap_us, session_rollup, sessionize,
    )

    gap_min = 0.5083
    assert session_gap_us(gap_min) == 30_498_000  # not 30_000_000
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(seconds=30, milliseconds=400)),
        (2, t0), (2, t0 + dt.timedelta(seconds=30, milliseconds=600)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = session_rollup(df, gap_minutes=gap_min).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1   # 30.4 s <= 30.498 s gap: merged
    assert len(by_user[2]) == 2   # 30.6 s  > 30.498 s gap: split
    assert by_user[1][0]["session_end"] == (
        rows[1][1] + dt.timedelta(microseconds=30_498_000))
    # the lag/cumsum sessionizer splits on the identical µs grid
    sess = sessionize(df, gap_minutes=gap_min).collect()
    sid = {(r["user_id"], r["ts"]): r["session_id"] for r in sess}
    assert sid[(1, rows[0][1])] == sid[(1, rows[1][1])]
    assert sid[(2, rows[2][1])] != sid[(2, rows[3][1])]
