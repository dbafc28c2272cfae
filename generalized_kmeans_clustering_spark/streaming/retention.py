"""Watermarked streaming cohort retention.

Streaming twin of :func:`..operators.rollup.retention_cohorts`. The
batch operator computes the full cohort × offset matrix over a table
at rest; the streaming shape is the FIRST-ACTIVITY STREAM — one
appended row ``(entity, cohort, offset)`` the first time an entity is
active ``offset`` periods after its cohort period. The retention
matrix is then a trivial additive aggregation over this stream
(count per (cohort, offset) + the offset-0 window denominator),
runnable downstream in batch or as a streaming agg: emissions are
exactly-once per (entity, offset) by construction, so the counts
compose.

Correctness under out-of-order arrival: an entity's COHORT is its
earliest event's period — a late earlier event would rewrite every
offset, so events buffer per entity until the watermark matures them
(the :mod:`.maturity` contract shared with the streaming as-of join
and funnel). The first MATURE event fixes the cohort; every mature
event then emits its offset at most once. Calendar math (period
bucketing, month/week/day offset indexes) is computed SPARK-SIDE with
``date_trunc`` before the stateful operator, so the streaming result
uses identical calendar semantics to the batch operator and the
DuckDB oracle — the state fn only does integer arithmetic.

State per entity: cohort (2 longs) + the seen-offset set (bounded by
calendar periods in the corpus horizon, e.g. 52/year weekly) + the
in-watermark buffer. Mature rows evict as they fold; the tail is
entity-cardinality-bounded like the as-of floor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .maturity import schedule_flush, split_mature

__all__ = ["streaming_retention", "retention_replay_flush"]


def retention_replay_flush(
    df: DataFrame,
    streamed: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Terminal flush for a BOUNDED (availableNow) replay of
    :func:`streaming_retention`: the first-activity rows the stream
    held back — (entity, offset) pairs whose activity sits in the
    stream's terminal watermark millisecond (the :mod:`.maturity`
    boundary) — in the streaming output schema, so ``streamed UNION
    flush`` equals :func:`~..operators.rollup.retention_pairs` of the
    replayed window exactly (and the downstream count therefore
    equals the batch retention matrix with no caveat). Same
    construction and rationale as :func:`.asof.asof_replay_flush`:
    the batch twin over the bounded data, null-safe anti-joined on
    (entity, offset) — offset, not cohort, because cohort is a
    function of the entity. Cost: one window + distinct pass over the
    replayed window + one anti-join."""
    from ..operators.rollup import retention_pairs

    batch = retention_pairs(df, entity_col=entity_col, ts_col=ts_col,
                            period=period, max_offset=max_offset)
    seen = streamed.select(F.col(entity_col).alias("_s_e"),
                           F.col("offset").alias("_s_o"))
    cond = (F.col(entity_col).eqNullSafe(F.col("_s_e"))
            & F.col("offset").eqNullSafe(F.col("_s_o")))
    return batch.join(seen, cond, "left_anti")

_STATE_SCHEMA = (
    "cset boolean, cohort long, cmix long, seen array<int>, "
    "bts array<long>, bb array<long>, bmix array<long>"
)


def _retention_step(buf, cohort, cmix, seen, wm_ms, max_offset):
    """Pure core: fold the mature slice of (ts_us, bucket_us, mix)
    rows into (cohort, cohort-mix, seen-offsets), emitting each
    (cohort_us, offset) the first time it is seen. ``mix`` is the
    Spark-computed monotone period index (days / ISO-week days / year
    ×12+month), so offset = mix − cohort_mix."""
    mature, keep = split_mature(buf, wm_ms)
    emits = []
    for _, b, mix in mature:
        if cohort is None:
            cohort, cmix = b, mix
        off = int(mix - cmix)
        if max_offset is not None and off > max_offset:
            continue
        if off not in seen:
            seen.add(off)
            emits.append((cohort, off))
    return emits, keep, cohort, cmix, seen


def _retention_fn(max_offset: int | None):
    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.exists:
            st = state.get
            # explicit has-cohort flag: a sentinel value would conflate
            # "no cohort yet" with a legitimate negative cohort (a
            # pre-1970 unix_micros bucket)
            cohort = int(st[1]) if st[0] else None
            cmix = int(st[2]) if st[0] else None
            seen = set(int(x) for x in st[3])
            buf = list(zip(st[4], st[5], st[6]))
        else:
            cohort, cmix, seen, buf = None, None, set(), []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = [int(t.value // 1000)
                         for t in pd.to_datetime(pdf["_t"])]
                buf.extend(zip(ts_us, (int(b) for b in pdf["_b"]),
                               (int(m) for m in pdf["_mix"])))
        wm_ms = state.getCurrentWatermarkMs()
        emits, keep, cohort, cmix, seen = _retention_step(
            buf, cohort, cmix, seen, wm_ms, max_offset)
        state.update((
            cohort is not None,
            cohort, cmix,
            sorted(seen),
            [r[0] for r in keep], [r[1] for r in keep],
            [r[2] for r in keep],
        ))
        schedule_flush(state, keep, wm_ms)
        if emits:
            yield pd.DataFrame({
                "entity": [entity] * len(emits),
                "cohort": [pd.Timestamp(c, unit="us") for c, _ in emits],
                "offset": [o for _, o in emits],
            })

    return fn


def streaming_retention(
    stream: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """Append-mode first-activity stream ``(entity, cohort, offset)``
    — at most one row per (entity, offset), emitted when the activity
    becomes watermark-final (see module doc). Aggregating
    ``count(*)`` per (cohort, offset) downstream reproduces the batch
    :func:`~..operators.rollup.retention_cohorts` ``n_active`` matrix
    exactly for an availableNow replay."""
    from pyspark.sql import types as T

    if period not in ("day", "week", "month"):
        raise ValueError("streaming_retention: period must be "
                         "day|week|month")
    for c in (entity_col, ts_col):
        if c not in stream.columns:
            raise ValueError(f"streaming_retention: column {c!r} missing")
    if not isinstance(stream.schema[ts_col].dataType, T.TimestampType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ent_t = stream.schema[entity_col].dataType.simpleString()
    bucket = F.date_trunc(period, F.col(ts_col))
    if period == "month":
        mix = F.year(bucket) * 12 + F.month(bucket)
    else:
        # days since epoch; weekly offsets divide the Monday-aligned
        # day difference by 7 at emission parity with datediff/7
        mix = F.datediff(bucket.cast("date"), F.lit("1970-01-01"))
        if period == "week":
            mix = F.floor(mix / 7)
    src = (
        stream.select(
            F.col(entity_col).alias("_e"),
            F.col(ts_col).alias("_t"),
            F.unix_micros(bucket).alias("_b"),
            mix.cast("long").alias("_mix"),
        )
        .withWatermark("_t", delay)
    )
    out = src.groupBy("_e").applyInPandasWithState(
        _retention_fn(max_offset),
        outputStructType=(f"entity {ent_t}, cohort timestamp, "
                          "offset int"),
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("entity", entity_col)
