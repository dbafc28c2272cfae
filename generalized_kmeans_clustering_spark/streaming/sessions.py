"""Watermarked streaming session rollup — the NATIVE-operator twin.

Unlike the :mod:`.asof` / :mod:`.funnel` / :mod:`.retention` twins
(custom ``applyInPandasWithState`` operators), session aggregation is
a capability Spark Structured Streaming ships natively:
``F.session_window`` is a stateful streaming aggregation whose state
store merges windows as events arrive, so the batch
:func:`~..operators.rollup.session_rollup` plan runs UNCHANGED under
``withWatermark`` + append mode. This module is therefore thin by
design — a watermark-attaching wrapper plus the terminal flush every
append-mode session query needs for a BOUNDED replay:

In append mode a session emits only when the watermark passes its END,
and a session's end is ``last event + gap`` — strictly greater than
every event time in the stream. The terminal watermark of an
availableNow replay is the stream's max event time, so sessions whose
last event lies within ``gap`` of the end of the replay are ALWAYS
held (at minimum, the session containing the final event). A live
stream must hold them — the next event could still extend the session;
a bounded replay knows it never will. :func:`session_replay_flush`
recovers exactly those rows, so ``streamed UNION flush`` equals the
batch :func:`~..operators.rollup.session_rollup` — the same closure
contract as :func:`.asof.asof_replay_flush` and its siblings.

Correctness of the streamed half (why no session can emit EARLY and
then be extended, which append mode could not retract): a session
finalizes only when the watermark passes its end, the watermark only
advances to event times already seen, and any event that would extend
the session precedes its end by construction of the merge rule — so
with per-batch time-ordered replay files every finalized session is
already maximal. Design with parity to the reference's session
semantics (reference has no streaming layer at all; both this and the
batch twin follow Spark's session_window merge rule, which is
boundary-INCLUSIVE: an event extends a session iff it arrives at most
``gap`` after the previous event — a delta of exactly ``gap`` merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_session_rollup", "session_replay_flush"]


def streaming_session_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
    delay: str = "0 seconds",
) -> DataFrame:
    """Per-session aggregates of a STREAM via the native
    ``session_window`` stateful aggregation: output
    ``(user_col, session_start, session_end, n_events)`` in append
    mode, one row per session emitted when the event-time watermark
    (lagging by ``delay``) passes the session's end. Identical output
    contract to the batch :func:`~..operators.rollup.session_rollup`;
    for a bounded replay, the sessions still open at end-of-stream are
    recovered by :func:`session_replay_flush` (see module doc).

    State is one merged-window row per (user, open session) — horizon
    × rate, never history; Spark evicts a window as soon as it
    finalizes. 100 TB shape: the aggregation shuffles on the user key
    exactly like the batch plan, and the state store is bounded by the
    number of concurrently-open sessions, not by throughput history.
    """
    from pyspark.sql import types as T

    from ..operators.rollup import session_rollup

    for c in (user_col, ts_col):
        if c not in stream.columns:
            raise ValueError(
                f"streaming_session_rollup: column {c!r} missing")
    if not isinstance(stream.schema[ts_col].dataType, T.TimestampType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return session_rollup(
        stream.withWatermark(ts_col, delay), ts_col, user_col, gap_minutes)


def session_replay_flush(
    df: DataFrame,
    streamed: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Terminal flush for a BOUNDED (availableNow) replay of
    :func:`streaming_session_rollup`: the sessions the stream held
    open at end-of-stream — every session whose end (last event +
    gap) exceeds the terminal watermark, always including the one
    containing the replay's final event — in the streaming output
    schema, so ``streamed UNION flush`` equals the batch
    :func:`~..operators.rollup.session_rollup` of the replayed window
    exactly. Same construction and rationale as
    :func:`.asof.asof_replay_flush`: recompute the batch twin over
    the bounded data the replay consumed, null-safe anti-join the
    streamed sink on the session identity ``(user, session_start)``
    (sessions of one user are disjoint intervals, so the start is a
    key). Cost: one batch session aggregation over the replayed
    window + one anti-join on the session key.

    The anti-join is spelled LEFT OUTER + null-filter, NOT
    ``"left_anti"``, deliberately: Catalyst's
    ``PushDownLeftSemiAntiJoin`` pushes a semi/anti join below an
    Aggregate whenever the join keys are grouping expressions — and
    ``session_start`` maps to the grouping key
    ``session_window.start``, which at the pre-aggregation level is
    each EVENT's raw window start, not the merged session start
    (session keys are the one grouping key family NOT stable under
    aggregation: ``MergingSessions`` rewrites them). The pushed plan
    deletes individual events whose raw start collides with a
    streamed session and emits fragment sessions that exist in
    neither stream nor batch (observed: a 2-event session returning
    as a phantom 1-event tail). The outer-join spelling keeps the
    filter above the merge, where the key is final."""
    from ..operators.rollup import session_rollup

    batch = session_rollup(df, ts_col, user_col, gap_minutes)
    seen = streamed.select(
        F.col(user_col).alias("_s_u"),
        F.col("session_start").alias("_s_st"),
        F.lit(1).alias("_s_seen"))
    cond = (F.col(user_col).eqNullSafe(F.col("_s_u"))
            & F.col("session_start").eqNullSafe(F.col("_s_st")))
    return (batch.join(seen, cond, "left")
            .where(F.col("_s_seen").isNull())
            .drop("_s_u", "_s_st", "_s_seen"))
