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
