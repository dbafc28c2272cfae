"""Executable documentation: the temporal/event-analytics layer.

One pass over the events table exercising the round-7 temporal
operators together the way a product-analytics pipeline would:

1. throttle duplicate bursts (at most one event per user/type/minute),
2. as-of join each click to the latest preceding error for that user,
3. funnel view -> click -> purchase,
4. weekly cohort retention,
5. hour->day rollup cascade for the dashboard,
6. WHO converted (funnel_completions, r10) segmented by
   time-to-convert,
7. per-segment retention drill-down: the joinable first-activity set
   (retention_pairs, r10) joined to the segment table BEFORE counting
   — the workflow the aggregated matrix cannot express.

Run standalone or via ``tests/test_examples.py``.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark import (
        asof_join, funnel_completions, funnel_rollup, retention_cohorts,
        retention_pairs, rollup_cascade, throttle_events,
    )

    import __spark_entry__ as entry

    ev = entry.events(spark, sf_dir)

    # 1. telemetry cleanup: one event per (user, type) per minute
    clean = throttle_events(ev, ("user_id", "event_type"), "ts",
                            window_seconds=60.0, tiebreak_col="event_id")
    kept = clean.count()

    # 2. each click learns the latest error the user saw before it
    clicks = clean.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts")
    errors = (clean.where(F.col("event_type") == "error")
              .groupBy("user_id", "ts")
              .agg(F.max("value").alias("err_value")))
    attributed = asof_join(clicks, errors, "user_id", "ts", "ts",
                           ["err_value"])
    clicks_after_error = attributed.where(
        F.col("err_value").isNotNull()).count()

    # 3. conversion funnel on the cleaned stream
    funnel = {r.stage: r.n_entities
              for r in funnel_rollup(
                  clean, ["view", "click", "purchase"]).collect()}

    # 4. weekly retention
    cohorts = retention_cohorts(clean, "user_id", "ts", period="week")
    n_cohort_cells = cohorts.count()

    # 5. dashboard rollups: hour buckets from raw, day from hour
    cascade = rollup_cascade(clean, "ts", "value", ("hour", "day"))
    grains = {r.grain: r.n
              for r in cascade.groupBy("grain")
              .agg(F.count(F.lit(1)).alias("n")).collect()}

    # 6. WHO converted: one row per completed view->click->purchase
    # chain with all three first-touch times (the batch twin of
    # streaming_funnel); segment converters by time-to-convert
    completions = funnel_completions(clean, ["view", "click", "purchase"])
    segments = completions.select(
        "user_id",
        F.when(F.col("t_2").cast("long") - F.col("t_0").cast("long")
               <= 7 * 86400, "fast").otherwise("slow").alias("segment"))
    n_converters = completions.count()

    # 7. per-segment retention: retention_pairs keeps the entity
    # column exactly so the first-activity set is JOINABLE against a
    # segment/experiment table before counting — count(*) per
    # (segment, offset) is the segmented retention matrix, the
    # drill-down retention_cohorts' aggregate cannot express
    pairs = retention_pairs(clean, "user_id", "ts", period="week")
    seg_matrix = (pairs.join(segments, "user_id")
                  .groupBy("segment", "offset")
                  .agg(F.count(F.lit(1)).alias("n_active"))
                  .orderBy("segment", "offset").collect())
    # every converter is active in its own cohort week, so the
    # offset-0 column of the segmented matrix sums to the converters
    offset0 = sum(r["n_active"] for r in seg_matrix if r["offset"] == 0)

    return {
        "events_in": ev.count(),
        "events_kept": kept,
        "clicks_after_error": clicks_after_error,
        "funnel": funnel,
        "cohort_cells": n_cohort_cells,
        "grain_buckets": grains,
        "converters": n_converters,
        "segment_retention_cells": len(seg_matrix),
        "segment_offset0_total": offset0,
    }


if __name__ == "__main__":
    s = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
    print(main(s))
    s.stop()
