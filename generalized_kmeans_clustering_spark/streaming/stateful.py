"""Custom stateful streaming operators via applyInPandasWithState.

Streaming-native sessionization: unlike the batch analog
(``operators/rollup.sessionize``, lag+cumsum windows), the streaming
version keeps per-user session state in the state store and emits a
row whenever a session CLOSES (gap exceeded or state timeout) — the
standard streaming-sessionization contract.

State per user: (session_start_us, last_seen_us, n_events, sum_value).
Timeout: processing-time, ``gap_minutes`` after the last batch that
touched the user, so idle sessions flush without new input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.rollup import session_gap_us

__all__ = ["streaming_sessionize"]

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, s double"


def _session_fn(gap_us: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id],
                 "session_start": [pd.Timestamp(start, unit="us")],
                 "session_end": [pd.Timestamp(last, unit="us")],
                 "n_events": [n], "sum_value": [s]}
            )
            return

        ts_list: list[int] = []
        val_list: list[float] = []
        for pdf in pdf_iter:
            ts_list.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
            )
            val_list.extend(float(v) for v in pdf["value"])
        order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])

        if state.exists:
            start, last, n, s = state.get
        else:
            start, last, n, s = None, None, 0, 0.0
        closed = []
        for i in order:
            t, v = ts_list[i], val_list[i]
            if start is None:
                start, last, n, s = t, t, 1, v
            elif t - last > gap_us:
                closed.append((start, last, n, s))
                start, last, n, s = t, t, 1, v
            else:
                last = max(last, t)
                n += 1
                s += v
        state.update((start, last, n, s))
        state.setTimeoutDuration(gap_us // 1000)  # ms
        if closed:
            yield pd.DataFrame(
                {"user_id": [user_id] * len(closed),
                 "session_start": [pd.Timestamp(c[0], unit="us")
                                   for c in closed],
                 "session_end": [pd.Timestamp(c[1], unit="us")
                                 for c in closed],
                 "n_events": [c[2] for c in closed],
                 "sum_value": [c[3] for c in closed]}
            )

    return fn


def streaming_sessionize(
    stream_df: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Stateful gap-sessionization of a stream; emits closed sessions.

    Input stream needs (user_col, ts_col, value_col). Works on any
    micro-batch source; one state-store entry per active user.
    """
    from pyspark.sql import functions as F

    gap_us = session_gap_us(gap_minutes)
    src = stream_df.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).alias("value"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
