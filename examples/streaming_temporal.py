"""Executable documentation: the WATERMARKED streaming temporal layer.

The batch temporal operators (asof_join / funnel_rollup /
retention_cohorts, see event_analytics.py) answer questions about a
table at rest; their streaming twins answer the same questions LIVE,
with one shared discipline (streaming/maturity.py): events buffer per
key only until the event-time watermark passes them, then fold into
O(1)-per-key state and evict — so state is horizon × rate, never
history, and an availableNow replay reproduces the batch answer
exactly.

1. streaming_asof_join — every click enriched with the latest
   preceding error for that user (state: one floor row per user);
   plus the r9 generalized contract: forward direction with a
   tolerance ("next click within 6h after each error").
2. streaming_funnel — a conversion row the instant a user completes
   view → click → purchase (state: k first-touch times per user).
3. streaming_retention — exactly-once (user, cohort, offset)
   first-activity rows; retention matrices are additive counts over
   this stream (state: cohort + seen offsets per user).
4. streaming_session_rollup (r11) — the NATIVE twin: Spark's
   session_window stateful aggregation, batch plan unchanged; plus
   session_replay_flush, because append mode can never emit the
   trailing sessions of a bounded replay (their end = last event +
   gap exceeds the terminal watermark).
5. streaming_throttle (r11) — the other native twin: tumbling-window
   min_by keeps the earliest event per (user, type, minute) live,
   epoch-aligned to the batch grid; throttle_replay_flush closes the
   trailing windows.

Run standalone or via ``tests/test_examples.py``.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001",
         workdir: str | None = None) -> dict:
    import shutil
    import tempfile

    from generalized_kmeans_clustering_spark import (
        asof_replay_flush, session_replay_flush, session_rollup,
        streaming_asof_join, streaming_funnel, streaming_retention,
        streaming_session_rollup, streaming_throttle, throttle_events,
        throttle_replay_flush,
    )

    import __spark_entry__ as entry

    owns_workdir = workdir is None
    if owns_workdir:
        workdir = tempfile.mkdtemp(prefix="gkm_stream_temporal_")

    # simulate a landing bucket: two time-split files (delay="0
    # seconds" leaves no cross-batch late allowance, so the replay
    # files are time-ordered; a live deployment sets a real delay)
    ev = entry.events(spark, sf_dir).select(
        "event_id", "user_id", "ts", "event_type", "value")
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    med = ev.select(tus.alias("_tus")).approxQuantile("_tus", [0.5], 0.0)[0]
    src = f"{workdir}/incoming"
    os.makedirs(src, exist_ok=True)
    for i, half in enumerate((ev.where(tus <= F.lit(int(med))),
                              ev.where(tus > F.lit(int(med))))):
        tmp = f"{workdir}/tmp{i}"
        half.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(f"{tmp}/{part}", f"{src}/{i:02d}.parquet")

    def stream():
        return (spark.readStream
                .schema("event_id long, user_id long, ts timestamp, "
                        "event_type string, value double")
                .option("maxFilesPerTrigger", 1).parquet(src))

    def run(out_df, name):
        q = (out_df.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", f"{workdir}/ck_{name}")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name}")

    # 1. live as-of enrichment: clicks gain the latest preceding error
    s = stream()
    enriched = run(
        streaming_asof_join(
            s.where("event_type = 'click'"),
            s.where("event_type = 'error'"),
            "user_id", "ts", "event_id", "value"),
        "ex_asof")
    n_clicks = enriched.count()
    n_matched = enriched.where(F.col("value").isNotNull()).count()

    # 1b. the generalized contract (r9): FORWARD direction with a
    # tolerance — each error annotated with the next click value
    # within 6 hours (the "did the user recover?" question). Forward
    # needs the tolerance to flush unmatched lefts: without it the
    # stream can never prove no later right will arrive.
    s = stream()
    recovered = run(
        streaming_asof_join(
            s.where("event_type = 'error'"),
            s.where("event_type = 'click'"),
            "user_id", "ts", "event_id", "value",
            direction="forward", tolerance_seconds=6 * 3600.0),
        "ex_asof_fwd")
    n_recovered = recovered.where(F.col("value").isNotNull()).count()

    # 1c. terminal flush (r10): a FINISHED availableNow replay may
    # hold unmatched errors whose tolerance deadline reached the
    # terminal watermark (a live stream must hold them — the click
    # could still come; a bounded replay knows it never will).
    # asof_replay_flush recovers exactly those rows, NULL-annotated,
    # so streamed ∪ flush equals the batch asof_join of the window.
    held = asof_replay_flush(
        ev.where("event_type = 'error'").select("user_id", "ts",
                                                "event_id"),
        ev.where("event_type = 'click'").select("user_id", "ts",
                                                "value"),
        recovered, "user_id", "ts", "event_id", "value",
        direction="forward", tolerance_seconds=6 * 3600.0)
    n_held = held.count()
    n_held_null = held.where(F.col("value").isNull()).count()
    n_errors_in = ev.where("event_type = 'error'").count()
    n_errors_streamed = recovered.count()

    # 2. live conversions: one row per completed view→click→purchase
    conversions = run(
        streaming_funnel(stream(), ["view", "click", "purchase"]),
        "ex_funnel")
    n_converted = conversions.count()

    # 3. live retention: additive first-activity stream → matrix
    pairs = run(streaming_retention(stream(), period="week"), "ex_ret")
    matrix = (pairs.groupBy("cohort", "offset")
              .agg(F.count(F.lit(1)).alias("n_active"))
              .orderBy("cohort", "offset").collect())

    # 4. live sessions via the NATIVE session_window aggregation (the
    # batch session_rollup plan unchanged under a watermark) + the
    # terminal flush: append mode emits a session only when the
    # watermark passes its END = last event + gap, which exceeds every
    # event time — so a bounded replay always holds the trailing
    # sessions; a live stream must (the next event could extend them)
    sessions = run(
        streaming_session_rollup(
            stream().select("user_id", "ts"), gap_minutes=30.0),
        "ex_sess")
    n_sessions_streamed = sessions.count()
    held_sessions = session_replay_flush(
        ev.select("user_id", "ts"), sessions, gap_minutes=30.0)
    n_sessions_held = held_sessions.count()
    n_sessions_batch = session_rollup(
        ev.select("user_id", "ts"), gap_minutes=30.0).count()

    # 5. live throttling via the other native twin: tumbling-window
    # min_by — one kept (earliest) event per (user, type, minute),
    # emitted live as each window matures; the flush closes the
    # replay's trailing windows
    tkw = dict(entity_cols=("user_id", "event_type"), ts_col="ts",
               window_seconds=60.0, tiebreak_col="event_id")
    kept = run(streaming_throttle(stream(), **tkw), "ex_thr")
    n_kept_streamed = kept.count()
    n_kept_held = throttle_replay_flush(ev, kept, **tkw).count()
    n_kept_batch = throttle_events(
        ev, ("user_id", "event_type"), "ts", 60.0, "event_id").count()

    for name in ("ex_asof", "ex_asof_fwd", "ex_funnel", "ex_ret",
                 "ex_sess", "ex_thr"):
        spark.catalog.dropTempView(name)
    if owns_workdir:
        shutil.rmtree(workdir, ignore_errors=True)
    return {
        "clicks": n_clicks,
        "clicks_with_error_context": n_matched,
        "errors_with_recovery_click": n_recovered,
        "errors_in": n_errors_in,
        "errors_streamed": n_errors_streamed,
        "errors_held_then_flushed": n_held,
        "errors_held_null_payload": n_held_null,
        "conversions": n_converted,
        "retention_cells": len(matrix),
        "sessions_streamed": n_sessions_streamed,
        "sessions_held_then_flushed": n_sessions_held,
        "sessions_batch": n_sessions_batch,
        "throttle_kept_streamed": n_kept_streamed,
        "throttle_kept_held_then_flushed": n_kept_held,
        "throttle_kept_batch": n_kept_batch,
    }


if __name__ == "__main__":
    session = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("streaming-temporal-example").getOrCreate()
    )
    try:
        print(main(session))
    finally:
        session.stop()
