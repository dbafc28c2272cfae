"""Temporal join and rollup operators.

Three shapes every event/time-series pipeline needs that Spark's
DataFrame API lacks as built-ins (reference-adjacent: the streaming
layer in streaming/streaming_kmeans.py consumes time-keyed batches;
these give batch pipelines the same time semantics):

- :func:`asof_join` — each left row picks the most recent right row at
  or before its timestamp (``direction="backward"``; ``"forward"`` =
  earliest at-or-after). Implemented as the classic union +
  carry-forward window: tag sides, union on (key, ts), one window per
  key with ``last(payload, ignorenulls=True)`` — ONE shuffle on the
  key, no range explosion, no inequality join. This is the only
  as-of formulation that survives 100 TB: a naive
  ``left.ts >= right.ts`` join is a per-key cross product.
- :func:`range_interval_join` — point-in-interval join via time
  bucketing: points get their one bucket, intervals explode over the
  buckets they cover, equi-join on (key, bucket) then exact filter.
  Each matching pair meets in exactly ONE bucket (the point's), so no
  dedup pass is needed. Cost: ceil(len/width)+1 bucket rows per
  interval instead of an unbounded inequality join.
- :func:`rollup_cascade` — hypertable-style continuous aggregates:
  the finest grain aggregates the raw table ONCE; every coarser grain
  re-aggregates the previous grain's partials (sums/counts compose).
  At 100 TB the raw scan dominates; the cascade above it is
  O(minutes-in-horizon), effectively free.

Scale notes:
- ``asof_join`` windows partition by key — a single hot key serializes
  its own timeline (inherent to as-of semantics: the carry-forward is
  a sequential scan of that key's history). Salting does not apply to
  order-dependent windows; shard hot keys upstream if one key holds
  >1 partition of rows.
- All three are pure DataFrame compositions — Catalyst handles
  pushdown/pruning; no Python on any hot path.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_interval_join", "rollup_cascade"]

_GRAIN_ORDER = ["minute", "hour", "day", "week", "month", "year"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key,
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    tiebreak_col: str | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """As-of (last-observation-carried-forward) left join.

    Every ``left`` row gains ``right_cols`` from the single right row
    with the greatest ``right_ts`` <= ``left_ts`` within the same key
    (``direction="backward"``, inclusive — DuckDB/pandas ``merge_asof``
    default), or the least ``right_ts`` >= ``left_ts`` for
    ``"forward"``. Unmatched rows keep NULLs (left-join semantics).
    ``matched_ts_col`` reports the matched right timestamp.

    If several right rows share the matching (key, timestamp) the
    winner follows ``tiebreak_col``'s ordering (greatest wins for
    backward, least for forward); without it the pick among exact
    timestamp duplicates is plan-order-dependent — pre-dedupe the
    right side when that matters.

    ``tolerance_seconds`` voids matches further than the tolerance
    from the left timestamp (payload and matched ts become NULL),
    mirroring ``pandas.merge_asof(tolerance=...)``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    keys = [key] if isinstance(key, str) else list(key)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    clash = (set(right_cols) | {matched_ts_col}) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: output columns {sorted(clash)} already exist on "
            "the left side; rename or pass right_cols explicitly")
    if matched_ts_col in right_cols:
        # the payload struct would carry two fields named matched_ts
        # (AMBIGUOUS_REFERENCE_TO_FIELDS at expansion time)
        raise ValueError(
            f"asof_join: right column {matched_ts_col!r} collides with "
            "matched_ts_col; pass a different matched_ts_col")

    payload = list(right_cols)
    reserved = {"_t", "_side", "_asof_tb", "_asof_p"} & (
        set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join: reserved working columns {sorted(reserved)} "
            "present on an input; rename them")
    tb = "_asof_tb"
    # The whole right payload travels as ONE struct so the carry is
    # row-atomic: a per-column last(ignorenulls) would skip a payload
    # column's legitimate NULL and splice in an older row's value.
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_t"),
        (F.col(tiebreak_col) if tiebreak_col is not None else F.lit(0)
         ).alias(tb),
        F.lit(0).alias("_side"),
        F.struct(
            *[F.col(c) for c in payload],
            F.col(right_ts).alias(matched_ts_col),
        ).alias("_asof_p"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("_t"),
        F.lit(None).cast(r.schema[tb].dataType).alias(tb),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_asof_p"].dataType).alias("_asof_p"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Backward: ascending time; at equal ts the right row must precede
    # the left row it matches (inclusive semantics) => _side ascending.
    # Among right ties, greater tiebreak last => carried forward.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_side").asc(), F.col(tb).asc()]
    else:
        order = [F.col("_t").desc(), F.col("_side").asc(), F.col(tb).desc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = u.select(
        *[c for c in left.columns], "_t",
        F.last("_asof_p", ignorenulls=True).over(w).alias("_asof_p"),
        "_side",
    ).where(F.col("_side") == 1)

    matched = F.col("_asof_p")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(
                matched[matched_ts_col].cast("timestamp"))
        ) / 1e6
        matched = F.when(
            matched.isNotNull() & (gap <= tolerance_seconds), matched)
    return out.select(
        *[c for c in left.columns],
        *[matched[c].alias(c) for c in payload],
        matched[matched_ts_col].alias(matched_ts_col),
    )


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_key: str,
    interval_key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: float = 86400.0,
    how: str = "inner",
    max_buckets_per_interval: int | None = 100_000,
) -> DataFrame:
    """Join each point to every interval (same key) containing it —
    half-open containment ``start <= t < end`` — without an
    inequality join.

    Both sides map timestamps to fixed ``bucket_seconds`` buckets;
    intervals explode over the buckets they overlap; the join is a
    plain equi-join on (key, bucket) followed by the exact containment
    filter. A matching pair meets exactly once (in the point's
    bucket), so the output needs no distinct.

    Pick ``bucket_seconds`` near the TYPICAL interval length: each
    interval materializes ``len/bucket + 1`` rows, and each bucket's
    join group holds the intervals overlapping it. Degenerate or
    reversed intervals (end <= start) match nothing.

    ``how="left"`` keeps points with no covering interval, with NULL
    interval columns.

    ``max_buckets_per_interval`` guards the explode: an interval whose
    length/width ratio exceeds it fails the job with a clear error
    (expression-level ``raise_error`` — no extra pass) instead of
    silently materializing millions of bucket rows; raise the cap or
    widen ``bucket_seconds`` for genuinely long intervals, or ``None``
    to disable.
    """
    if how not in ("inner", "left"):
        raise ValueError("range_interval_join: how must be inner|left")
    if bucket_seconds <= 0:
        raise ValueError("range_interval_join: bucket_seconds must be > 0")
    overlap = (set(points.columns) & set(intervals.columns)) - (
        {point_key} & {interval_key})
    if overlap:
        raise ValueError(
            f"range_interval_join: ambiguous columns {sorted(overlap)}; "
            "rename before joining")
    reserved = {"_b"} & (set(points.columns) | set(intervals.columns))
    if reserved:
        raise ValueError(
            "range_interval_join: reserved working column '_b' present "
            "on an input; rename it")
    w_us = int(bucket_seconds * 1_000_000)

    def _bucket(ts_col: Column) -> Column:
        return F.floor(F.unix_micros(ts_col.cast("timestamp")) / F.lit(w_us))

    p = points.withColumn("_b", _bucket(F.col(point_ts)))
    b_lo = _bucket(F.col(start_ts))
    # end is exclusive: a point at exactly end never matches, but the
    # bucket containing (end - 1us) must be covered.
    b_hi = _bucket(F.col(end_ts) - F.expr("INTERVAL 1 MICROSECOND"))
    if max_buckets_per_interval is not None:
        b_hi = F.when(
            b_hi - b_lo >= F.lit(int(max_buckets_per_interval)),
            F.raise_error(F.lit(
                "range_interval_join: an interval spans more than "
                f"{int(max_buckets_per_interval)} buckets of "
                f"{bucket_seconds}s — widen bucket_seconds or raise "
                "max_buckets_per_interval")).cast("long"),
        ).otherwise(b_hi)
    iv = intervals.where(F.col(end_ts) > F.col(start_ts)).withColumn(
        "_b", F.explode(F.sequence(b_lo, b_hi)),
    )
    cond = [
        p[point_key] == iv[interval_key],
        p["_b"] == iv["_b"],
        p[point_ts] >= iv[start_ts],
        p[point_ts] < iv[end_ts],
    ]
    keep_iv = [c for c in intervals.columns
               if not (c == interval_key and interval_key == point_key)]
    return p.join(iv, cond, how).select(
        *[p[c] for c in points.columns],
        *[iv[c] for c in keep_iv],
    )


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: Sequence[str] = ("minute", "hour", "day"),
    group_cols: Sequence[str] = (),
    persist: bool = True,
    pins=None,
) -> DataFrame:
    """Multi-granularity time rollup where only the FINEST grain reads
    the raw table; every coarser grain re-aggregates the finer grain's
    partial (count, sum) rows — the hypertable "continuous aggregate"
    cascade. Returns the union of all grains with columns
    ``(grain, bucket_ts, *group_cols, n_events, sum_value,
    avg_value)``; ``avg`` is derived as sum/count at the end so it
    composes through the cascade.

    ``grains`` must go finest → coarsest and each must be a
    ``date_trunc`` unit that nests in the next (minute ⊂ hour ⊂ day ⊂
    week|month; week ⊂ NOTHING coarser — an ISO week straddles month
    and year boundaries, so ``week`` is only valid as the LAST grain;
    requesting anything after it raises rather than silently putting
    New-Year's-week events in the wrong year).

    ``persist=True`` (default) caches the finest-grain partials —
    WITHOUT it Spark recomputes the shared aggregate subtree per union
    branch and the raw table is scanned once per grain (verified: no
    ReusedExchange fires across the branches). The cache is
    O(finest buckets × groups) rows — trivial next to the raw scan it
    saves. Pass a :class:`~.pins.Pins` as ``pins`` to release the
    partial frame when done in a long-lived session (the handle
    survives composition — unpersisting the RESULT would not release
    this cache, and an attribute on the result would vanish on any
    further transformation); one-shot jobs can omit it.
    """
    gs = list(grains)
    if not gs:
        raise ValueError("rollup_cascade: need at least one grain")
    idx = []
    for g in gs:
        if g not in _GRAIN_ORDER:
            raise ValueError(f"rollup_cascade: unknown grain {g!r}")
        idx.append(_GRAIN_ORDER.index(g))
    if idx != sorted(idx) or len(set(idx)) != len(idx):
        raise ValueError("rollup_cascade: grains must be strictly "
                         "finest -> coarsest")
    if "week" in gs and gs[-1] != "week":
        # an ISO week straddles month/year boundaries: re-truncating
        # week buckets to any coarser unit misfiles boundary weeks
        raise ValueError("rollup_cascade: week does not nest in any "
                         "coarser grain; it must be the last grain")
    groups = list(group_cols)

    finest = gs[0]
    level = (
        df.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_ts"), *groups)
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum(value_col).alias("sum_value"))
    )
    if persist and len(gs) > 1:
        level = level.persist()
        if pins is not None:
            pins.add(level)
    levels = [level.withColumn("grain", F.lit(finest))]
    for g in gs[1:]:
        level = (
            level.groupBy(
                F.date_trunc(g, F.col("bucket_ts")).alias("bucket_ts"),
                *groups)
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sum_value").alias("sum_value"))
        )
        levels.append(level.withColumn("grain", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    out = out.select(
        "grain", "bucket_ts", *groups, "n_events", "sum_value",
        (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
    )
    return out
