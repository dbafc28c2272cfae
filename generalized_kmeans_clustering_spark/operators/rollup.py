"""Event-table rollups: tumbling windows, sessionization, top-k.

Engine extensions (driver mandate — relational coverage for the
``events`` table). All distributed, one shuffle each:

- ``tumbling_rollup``: event-time tumbling-window aggregation via
  ``F.window`` — the SAME operator shape Structured Streaming uses, so
  a streaming source with a watermark can reuse the plan verbatim
  (`readStream → withWatermark → this → writeStream`);
- ``sessionize``: gap-based session ids per user with lag + cumulative
  sum window functions (the batch analog of
  ``F.session_window``);
- ``top_k_by_count``: per-group top-k via ``row_number`` window;
- ``json_prop``: typed extraction from the JSON ``props`` column
  (``get_json_object`` — pushdown-friendly, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["tumbling_rollup", "sessionize", "session_rollup",
           "top_k_by_count", "json_prop", "rolling_zscore",
           "funnel_rollup", "funnel_completions", "funnel_stage_predicates",
           "retention_cohorts", "retention_pairs", "throttle_events",
           "throttle_grid_us", "session_gap_us"]


def session_gap_us(gap_minutes: float) -> int:
    """Session inactivity gap in microseconds — the SINGLE definition
    shared by :func:`sessionize`, :func:`session_rollup` (and through
    it the streaming twin in :mod:`..streaming.sessions`), and the SQL
    oracles, so sub-minute fractional gaps (e.g. ``gap_minutes=0.5083``)
    split sessions identically everywhere. ``round`` (not truncation)
    for the same float-product reason as :func:`throttle_grid_us`."""
    if gap_minutes <= 0:
        raise ValueError("session gap_minutes must be > 0")
    return int(round(gap_minutes * 60.0 * 1_000_000))


def throttle_grid_us(window_seconds: float) -> int:
    """Width of the epoch-aligned throttle window grid in microseconds.

    The SINGLE definition shared by batch :func:`throttle_events` and
    the streaming twin (:mod:`..streaming.throttle`) — both tile time
    as ``floor(epoch_us / throttle_grid_us(w))``, so the streamed ∪
    flush == batch contract holds bit-exactly for ANY window width.
    ``round`` (not truncation) so fractional widths whose float product
    lands just below an integer (8.2 s → 8_199_999.999…) still tile
    the intended 8_200_000 µs grid.
    """
    if window_seconds <= 0:
        raise ValueError("throttle window_seconds must be > 0")
    return int(round(window_seconds * 1_000_000))


def tumbling_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """(keys…, window_start, n, sum_value, avg_value) per tumbling window."""
    return (
        df.groupBy(*keys, F.window(F.col(ts_col), window).alias("_w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("sum_value"),
            F.avg(value_col).alias("avg_value"),
        )
        .select(*keys, F.col("_w.start").alias("window_start"),
                "n", "sum_value", "avg_value")
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Attach ``session_id`` (per-user ordinal) via gap-based windows.

    One shuffle on user_id; within each user the lag/cumsum pair is a
    linear scan — the standard batch sessionization plan.

    Type-robust: parquet written as ``timestamp[us]`` without a timezone
    loads as ``TIMESTAMP_NTZ``, which ``unix_micros`` rejects — so the
    column is cast to ``TIMESTAMP`` once up front (the session timezone
    is pinned to UTC in bench/tests, so the cast is a pure relabel).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = session_gap_us(gap_minutes)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull()
        | (F.unix_micros(ts) - F.unix_micros(prev) > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn("_new", new_session).withColumn(
        "session_id", F.sum("_new").over(w)
    ).drop("_new")


def top_k_by_count(
    df: DataFrame,
    group_col: str = "event_type",
    entity_col: str = "user_id",
    k: int = 3,
) -> DataFrame:
    """Top-k entities per group by event count (ties → lower entity id)."""
    counts = df.groupBy(group_col, entity_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("n"), F.asc(entity_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, entity_col, "n", "rank")
    )


def json_prop(props: Column, key: str, cast: str | None = None) -> Column:
    """Extract ``$.key`` from a JSON string column (JVM-side)."""
    out = F.get_json_object(props, f"$.{key}")
    return out.cast(cast) if cast else out


def session_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE ``session_window``.

    One groupBy on (user, merged session window): start = first event,
    end = last event + gap, n_events. Unlike :func:`sessionize` (ordinal
    ids via lag/cumsum — a batch-only window plan), this plan runs
    UNCHANGED as a streaming stateful aggregation under
    ``withWatermark`` — the state store merges windows as late events
    arrive. Spark merge rule (boundary-INCLUSIVE — pinned by test in
    r11): an event extends the session iff it arrives at most ``gap``
    after the previous event; a delta of exactly ``gap`` still merges,
    because the event windows ``[t, t+gap)`` and ``[t+gap, …)`` touch
    and Spark merges on ``start <= current_end``. (The lag/cumsum
    :func:`sessionize` uses ``delta > gap`` for a new session — the
    same inclusive boundary — so the two stay consistent.)
    """
    from pyspark.sql import types as T

    # cast in place only when needed (NTZ parquet) — staging the cast
    # into a NEW column would sever an attached watermark and break the
    # streaming plan
    if not isinstance(df.schema[ts_col].dataType, T.TimestampType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    # microsecond-precision gap (r12): the previous whole-second
    # truncation made the engine disagree with the µs-precision SQL
    # oracle for sub-second-granularity gaps (r11 advisor finding)
    gap = f"{session_gap_us(gap_minutes)} microseconds"
    return (
        df.groupBy(user_col, F.session_window(ts_col, gap).alias("_w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            user_col,
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
            "n_events",
        )
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    partition_col: str = "event_type",
    id_col: str = "event_id",
    lookback: int = 50,
    min_history: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-row anomaly score against the partition's OWN recent
    history: z = (x − mean)/std over the ``lookback`` PRECEDING rows
    (the current row is excluded — an outlier must not launder its own
    baseline), ordered by (ts, id) within each partition. Adds
    ``n_history``, ``zscore`` (NULL until ``min_history`` rows and
    whenever the trailing std is 0) and ``is_anomaly``
    (|z| > threshold; false while z is NULL).

    Mean/std are computed from explicit Σx and Σx² frame sums with the
    sample-variance formula — the same left-to-right arithmetic in any
    engine, so the oracle matches bitwise (built-in stddev aggregates
    differ across engines in summation order). One shuffle on the
    partition key; frames are O(lookback) per row. At 100 TB the
    partition key should be (entity, day)-grained so no single entity
    serializes onto one reducer forever — the rolling frame only needs
    lookback rows of warm-up per key to re-establish the baseline.
    """
    if lookback <= 0:
        raise ValueError("lookback must be positive")
    if min_history < 2:
        # n = 1 makes the sample-variance denominator zero; Spark's
        # NaN-is-largest comparison semantics would let the NaN std
        # through the std > 0 guard
        raise ValueError("min_history must be >= 2")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-lookback, -1)
    )
    x = F.col(value_col)
    n = F.count(x).over(w)
    s1 = F.sum(x).over(w)
    s2 = F.sum(x * x).over(w)
    staged = df.withColumns({
        "_n": n, "_s1": s1, "_s2": s2,
    })
    mean = F.col("_s1") / F.col("_n")
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")) / (
        F.col("_n") - 1
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (F.col("_n") >= min_history) & (std > 0),
        (x - mean) / std,
    )
    return (
        staged.withColumn("n_history", F.col("_n"))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.coalesce(F.abs(z) > threshold, F.lit(False)),
        )
        .drop("_n", "_s1", "_s2")
    )


def funnel_stage_predicates(stages, type_col: str):
    """Normalize a funnel ``stages`` spec into ``(labels, predicates)``.

    Each entry is either a STRING ``s`` — matched as
    ``type_col == s`` (the classic event-name funnel) — or a
    ``(label, predicate)`` pair where the predicate is a Column or SQL
    string over the event row (``"event_type = 'click' AND value >
    50"``), so stages can be arbitrary event shapes, not just type
    names. Predicates MAY overlap (an event can qualify for several
    stages — each stage's chain rule evaluates it independently,
    exactly as the batch window chain always has).

    Duplicate labels: a repeated STRING stage is a legitimate revisit
    funnel (``['view', 'click', 'view']``) — its predicate is derived
    from the string, so the repeat is auto-uniquified in the returned
    labels (``view``, ``view#2``, …; ``stage_idx`` disambiguates
    regardless). Any collision INVOLVING an explicit ``(label,
    predicate)`` entry raises, in either order — two different
    predicates under one name is a spec bug, and the pair form can
    always pick distinct labels (auto-renaming either side would
    silently change which stage the name refers to). Shared by
    :func:`funnel_rollup` and the streaming twin so both sides
    resolve one stages spec identically."""
    labels, preds, explicit = [], [], []
    for s in stages:
        if isinstance(s, str):
            labels.append(s)
            preds.append(F.col(type_col) == s)
            explicit.append(False)
        else:
            label, p = s
            labels.append(str(label))
            preds.append(F.expr(p) if isinstance(p, str) else p)
            explicit.append(True)
    explicit_labels = {lab for lab, ex in zip(labels, explicit) if ex}
    seen: dict[str, int] = {}
    taken = set()
    for i, lab in enumerate(labels):
        n = seen.get(lab, 0)
        seen[lab] = n + 1
        if n or lab in taken:
            if explicit[i] or lab in explicit_labels:
                raise ValueError(
                    f"funnel stages: duplicate stage label {lab!r} — "
                    "only a repeated STRING stage (revisit funnel) is "
                    "auto-uniquified; a collision involving an explicit "
                    "(label, predicate) entry must pick distinct labels")
            k = n + 1
            while f"{lab}#{k}" in taken:
                k += 1
            labels[i] = f"{lab}#{k}"
        taken.add(labels[i])
    return labels, preds


def _stage_times(df: DataFrame, preds, entity_col: str, ts_col: str,
                 max_span_seconds) -> DataFrame:
    """One row per entity with its k first-touch stage times
    (``entity, _t0.._t{k-1}``) — the chain of conditional window
    minimums shared by :func:`funnel_rollup` (which counts them) and
    :func:`funnel_completions` (which returns the converted rows).
    One shuffle on the entity key; no joins, no per-stage passes."""
    w = Window.partitionBy(entity_col)
    t = F.min(F.when(preds[0], F.col(ts_col))).over(w)
    stage_ts = [t]
    for p in preds[1:]:
        prev = stage_ts[-1]
        cond = p & (F.col(ts_col) > prev)
        if max_span_seconds is not None:
            cond = cond & (
                (F.unix_micros(F.col(ts_col).cast("timestamp"))
                 - F.unix_micros(stage_ts[0].cast("timestamp")))
                <= int(max_span_seconds * 1_000_000))
        stage_ts.append(F.min(F.when(cond, F.col(ts_col))).over(w))
    return df.select(
        F.col(entity_col).alias("entity"),
        *[ts.alias(f"_t{i}") for i, ts in enumerate(stage_ts)],
    ).groupBy("entity").agg(
        *[F.first(f"_t{i}").alias(f"_t{i}")
          for i in range(len(stage_ts))]
    )


def funnel_completions(
    df: DataFrame,
    stages,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """WHO converted, and when: one row per entity that completed
    every funnel stage, with all k first-touch stage times —
    ``(entity_col, t_0 … t_{k-1} timestamp)``. The batch twin of
    :func:`~..streaming.funnel.streaming_funnel` (identical output
    schema and row set for the same bounded data), and the per-entity
    complement of :func:`funnel_rollup`'s per-stage counts (same
    ``stages`` contract, same one-window-pass chain — counts equal
    ``count(funnel_completions)`` at the final stage by
    construction). Stage times are cast to timestamp, matching the
    streaming emit schema."""
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel_completions: need at least 2 stages")
    labels, preds = funnel_stage_predicates(stages, type_col)
    k = len(labels)
    per_entity = _stage_times(df, preds, entity_col, ts_col,
                              max_span_seconds)
    return (
        per_entity.where(F.col(f"_t{k - 1}").isNotNull())
        .select(
            F.col("entity").alias(entity_col),
            *[F.col(f"_t{i}").cast("timestamp").alias(f"t_{i}")
              for i in range(k)],
        )
    )


def funnel_rollup(
    df: DataFrame,
    stages,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Ordered first-touch funnel: for each entity, stage i counts as
    reached iff an event matching stage i's predicate occurs STRICTLY
    after the time stage i-1 was reached (first qualifying event
    wins). ``stages`` entries are event-type strings or
    ``(label, predicate)`` pairs — see
    :func:`funnel_stage_predicates`; a repeated string stage (a
    revisit funnel, ``['view', 'click', 'view']``) is accepted, with
    the repeat's output label uniquified to ``view#2``. Returns one
    row per stage:
    ``(stage_idx, stage, n_entities, conversion)`` where conversion =
    n_entities / stage-0 entities (NULL when nobody enters the
    funnel).

    ``max_span_seconds`` additionally requires every stage to land
    within that many seconds of the STAGE-0 time (a common funnel
    window rule).

    Distributed shape: all k stage times resolve in ONE window pass
    over the entity partition — stage i's reach time is
    ``min(ts WHERE pred_i AND ts > t_{i-1})`` expressed as a
    chain of window minimums, so the plan is one shuffle on the entity
    key + one tiny per-stage aggregation; no joins, no per-stage
    passes over the raw table, no collect. Entities are hash-spread;
    a single entity's history lands on one reducer (inherent to
    per-entity ordering).
    """
    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("funnel_rollup: need at least 2 stages")
    labels, preds = funnel_stage_predicates(stages, type_col)
    stages = labels
    per_entity = _stage_times(df, preds, entity_col, ts_col,
                              max_span_seconds)
    counts = per_entity.agg(*[
        F.count(f"_t{i}").alias(f"_n{i}") for i in range(len(stages))
    ])
    # one k-element struct array exploded from the single counts row —
    # a per-stage union would recompute the whole pipeline per branch
    stage_rows = F.array(*[
        F.struct(
            F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"),
            F.col(f"_n{i}").alias("n_entities"),
            F.when(F.col("_n0") > 0,
                   F.col(f"_n{i}") / F.col("_n0")).alias("conversion"),
        )
        for i, s in enumerate(stages)
    ])
    return counts.select(F.explode(stage_rows).alias("_r")).select("_r.*")


def _retention_cells(df: DataFrame, entity_col: str, ts_col: str,
                     period: str, max_offset, what: str) -> DataFrame:
    """Distinct ``(cohort, offset, entity)`` first-activity cells —
    the shared core of :func:`retention_cohorts` (which counts them)
    and :func:`retention_pairs` (which returns them). Cohort attaches
    via one window min per entity; activity collapses to distinct
    (entity, period) BEFORE anything aggregates."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"{what}: period must be day|week|month")
    w = Window.partitionBy(entity_col)
    ts = F.col(ts_col).cast("timestamp")
    staged = df.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc(period, ts).alias("bucket"),
        F.date_trunc(period, F.min(ts).over(w)).alias("cohort"),
    ).distinct()
    if period == "month":
        off = (
            (F.year("bucket") - F.year("cohort")) * 12
            + (F.month("bucket") - F.month("cohort"))
        )
    elif period == "week":
        off = F.floor(F.datediff("bucket", "cohort") / 7)
    else:
        off = F.datediff("bucket", "cohort")
    cells = staged.select(
        "cohort", off.cast("int").alias("offset"), "entity")
    if max_offset is not None:
        cells = cells.where(F.col("offset") <= max_offset)
    return cells


def retention_pairs(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """The first-activity SET behind the retention matrix: one row
    per ``(entity, offset)`` an entity was active in —
    ``(entity_col, cohort timestamp, offset int)``, exactly
    :func:`~..streaming.retention.streaming_retention`'s emit schema
    and row set for the same bounded data (the batch twin). Counting
    ``count(*)`` per (cohort, offset) reproduces
    :func:`retention_cohorts`'s ``n_active`` by construction; keeping
    the entity column makes the set joinable (e.g. against a
    segment/experiment table) before counting — the drill-down the
    aggregated matrix cannot express."""
    cells = _retention_cells(df, entity_col, ts_col, period, max_offset,
                             "retention_pairs")
    return cells.select(
        F.col("entity").alias(entity_col), "cohort", "offset")


def retention_cohorts(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention: entities grouped by the period of their FIRST
    event (the cohort); for each later period, how many of them were
    active. Output ``(cohort, offset, n_active, retention)`` with
    ``offset`` the whole number of periods after the cohort period and
    ``retention = n_active / cohort size`` (cohort size = n_active at
    offset 0 — every entity is active in its own first period by
    construction).

    ``period`` ∈ day|week|month. ``max_offset`` trims the long tail.

    Distributed shape: the cohort timestamp attaches via one window
    min over the entity partition (shuffle #1); activity collapses to
    distinct (entity, period) pairs and aggregates to cohort × offset
    cells (shuffle #2); the retention denominator is a window max over
    the tiny cell frame. No joins against the raw table, no collect.
    """
    cells = _retention_cells(df, entity_col, ts_col, period, max_offset,
                             "retention_cohorts")
    # (cohort, offset, entity) is already unique — staged is distinct
    # over (entity, bucket, cohort) and bucket -> offset is injective
    # per cohort — so a plain count avoids the two-phase
    # distinct-aggregate on the dominant shuffle
    agg = cells.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).alias("n_active"))
    wc = Window.partitionBy("cohort")
    base = F.max(F.when(F.col("offset") == 0, F.col("n_active"))).over(wc)
    return agg.select(
        "cohort", "offset", "n_active",
        F.when(base > 0, F.col("n_active") / base).alias("retention"),
    )


def throttle_events(
    df: DataFrame,
    entity_cols=("user_id", "event_type"),
    ts_col: str = "ts",
    window_seconds: float = 60.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Rate-limit to at most ONE event per entity per fixed
    ``window_seconds`` window — the earliest in each window wins
    (telemetry duplicate-burst cleanup). Fixed windows, not
    last-kept-relative debounce: the fixed grid is expressible as a
    pure groupBy (one shuffle, streaming-compatible semantics) while
    true debounce is an inherently sequential per-entity scan.

    Ties on the minimum timestamp inside a window resolve by
    ``tiebreak_col`` (least wins) when given — otherwise ties keep one
    plan-order-dependent row. Returns the kept rows with original
    columns.
    """
    reserved = {"_bucket", "_rn"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"throttle_events: reserved working columns "
            f"{sorted(reserved)} present on the input; rename them")
    keys = list(entity_cols)
    w_us = throttle_grid_us(window_seconds)
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(w_us))
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    win = Window.partitionBy(*(keys + ["_bucket"])).orderBy(*order)
    return (
        df.withColumn("_bucket", bucket)
        .withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .drop("_bucket", "_rn")
    )
