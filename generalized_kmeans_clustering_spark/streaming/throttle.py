"""Watermarked streaming event throttle — the second NATIVE twin.

:func:`~..operators.rollup.throttle_events` rate-limits a table to the
earliest event per entity per fixed time window. Its fixed-grid design
was chosen PRECISELY so the streaming twin needs no custom state op
(the operator's docstring contrasts it with sequential debounce): a
tumbling-window groupBy with a ``min_by`` aggregate is the whole plan —

    stream.withWatermark(ts, delay)
          .groupBy(*entity_cols, window(ts, w))
          .agg(min_by(struct(*columns), ordering))

Spark's streaming window aggregation keeps one candidate row of state
per open (entity, window) and emits it in append mode when the
watermark passes the window END. As with every append-mode time
aggregation, the final window(s) of a BOUNDED replay never emit (a
window's end exceeds its own events' times, and the terminal watermark
is the max event time) — :func:`throttle_replay_flush` recovers them,
so ``streamed UNION flush`` equals the batch ``throttle_events``
exactly. The window grid is epoch-aligned on both sides (batch:
``floor(epoch_us / w_us)``; streaming: ``F.window`` with a
microsecond-precision interval), so the buckets coincide bit-exactly.

This completes the temporal streaming family: as-of join, funnel,
retention (custom ``applyInPandasWithState`` ops over the shared
:mod:`.maturity` discipline), session rollup and throttle (native
stateful aggregations) — each with a terminal flush making the
bounded replay equal its batch twin with no caveat.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_throttle", "throttle_replay_flush"]


def _win(ts_col: str, window_seconds: float):
    # Same grid constant as batch throttle_events — one shared helper,
    # so fractional widths (e.g. 8.2 s) tile the identical epoch grid
    # on both sides and the streamed ∪ flush == batch contract holds.
    from ..operators.rollup import throttle_grid_us

    w_us = throttle_grid_us(window_seconds)
    return F.window(F.col(ts_col), f"{w_us} microseconds"), w_us


def streaming_throttle(
    stream: DataFrame,
    entity_cols: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    window_seconds: float = 60.0,
    tiebreak_col: str | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """Rate-limit a STREAM to the earliest event per entity per fixed
    ``window_seconds`` window — the streaming twin of
    :func:`~..operators.rollup.throttle_events`, same keep rule
    (earliest ``ts_col`` wins, ties resolve by ``tiebreak_col`` least
    when given) and same epoch-aligned grid. Emits each kept row
    (original columns) in append mode once its window matures under
    the event-time watermark; for a bounded replay the trailing
    windows are recovered by :func:`throttle_replay_flush`.

    100 TB shape: identical shuffle key to the batch plan
    ``(entity_cols, window)``; state is ONE candidate row per open
    (entity, window) — horizon × arrival-rate, never history.
    """
    from pyspark.sql import types as T

    for c in (*entity_cols, ts_col):
        if c not in stream.columns:
            raise ValueError(f"streaming_throttle: column {c!r} missing")
    if tiebreak_col is not None and tiebreak_col not in stream.columns:
        raise ValueError(
            f"streaming_throttle: tiebreak column {tiebreak_col!r} missing")
    if not isinstance(stream.schema[ts_col].dataType, T.TimestampType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win, _ = _win(ts_col, window_seconds)
    order = (F.struct(F.col(ts_col), F.col(tiebreak_col))
             if tiebreak_col is not None else F.col(ts_col))
    cols = list(stream.columns)
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(*[F.col(c) for c in entity_cols], win.alias("_w"))
        .agg(F.min_by(F.struct(*cols), order).alias("_kept"))
        .select("_kept.*")
    )


def throttle_replay_flush(
    df: DataFrame,
    streamed: DataFrame,
    entity_cols: Sequence[str] = ("user_id", "event_type"),
    ts_col: str = "ts",
    window_seconds: float = 60.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Terminal flush for a BOUNDED (availableNow) replay of
    :func:`streaming_throttle`: the kept rows of the windows the
    stream held open at end-of-stream (every window whose end exceeds
    the terminal watermark — always including the one holding the
    replay's final event), in the streaming output schema, so
    ``streamed UNION flush`` equals the batch
    :func:`~..operators.rollup.throttle_events` of the replayed window
    exactly. Same construction as the other terminal flushes: the
    batch twin over the bounded data, anti-joined on the kept-row
    identity ``(entity_cols…, window bucket)`` — spelled LEFT OUTER +
    null-filter like :func:`.sessions.session_replay_flush` (here the
    tumbling-window grouping key is stable under aggregation, so the
    semi/anti pushdown would be sound — the outer-join spelling is
    kept for uniformity and zero optimizer exposure). Cost: one batch
    throttle pass + one anti-join on the window key."""
    from ..operators.rollup import throttle_events

    _, w_us = _win(ts_col, window_seconds)
    batch = throttle_events(df, tuple(entity_cols), ts_col,
                            window_seconds, tiebreak_col)
    bucket = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(w_us))
    seen = streamed.select(
        *[F.col(c).alias(f"_s_{c}") for c in entity_cols],
        bucket.alias("_s_b"),
        F.lit(1).alias("_s_seen"))
    cond = bucket.eqNullSafe(F.col("_s_b"))
    for c in entity_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_s_{c}"))
    drop = [f"_s_{c}" for c in entity_cols] + ["_s_b", "_s_seen"]
    return (batch.join(seen, cond, "left")
            .where(F.col("_s_seen").isNull())
            .drop(*drop))
