"""Watermarked streaming as-of join.

Streaming twin of :func:`..operators.temporal.asof_join` (the batch
union + carry-forward window): every left event is enriched with the
most recent right event at-or-before its timestamp for the same key.

Mechanics: both sides are tagged and unioned into ONE keyed stateful
operator (``applyInPandasWithState``), the same construction the batch
operator uses — but here the "window" is the state store:

- Incoming rows buffer per key until the event-time watermark passes
  them (out-of-order arrivals inside the watermark horizon are safe:
  nothing is emitted until its event time is FINAL).
- When the watermark advances, the mature slice of the buffer is
  walked in (ts, side) order — right rows update the carry-forward
  floor, left rows emit with the current floor — exactly the batch
  window's ``last(payload, ignorenulls=True)`` semantics.
- Evicted state: matured buffer rows are dropped; only the FLOOR (the
  single latest mature right row) survives per key, because any
  future left row can still match it. State per key is therefore
  ``1 + (rows inside the watermark horizon)`` — bounded by horizon ×
  rate, not history (the streaming_throttle bound), with the floor
  row giving the same key-cardinality tail bound as StreamingKMeans'
  center state.
- Keys with immature rows register an event-time timeout at the
  earliest immature timestamp, so the availableNow final no-data
  batch (and any idle period after the watermark advances) flushes
  them without new input — this is what makes an availableNow replay
  reproduce the batch ``asof_join`` exactly (the correctness-gate
  recipe shared with streaming_semantic_pairs/streaming_drift).

Late data (older than the watermark when it arrives) is dropped by
the watermark, as in every Spark stateful operator: the already-
emitted history is never rewritten. Maturity is at millisecond
granularity (Spark's watermark unit); sub-millisecond timestamp
components order within the batch walk but not across the maturity
boundary.

Contract kept deliberately narrow (the batch operator is the general
path): one key column, one numeric right payload column, one left id
column carried through. Right rows sharing (key, ts) resolve by
greatest payload value — pre-dedupe the right side when other
semantics are wanted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .maturity import schedule_flush

__all__ = ["streaming_asof_join"]

_STATE_SCHEMA = (
    "fts long, fv double, "
    "bts array<long>, bside array<int>, bid array<long>, bv array<double>"
)


def _asof_step(buf, fts, fv, wm_ms):
    """Pure core, unit-testable without a stream: walk the buffer's
    mature slice (event-time ms <= wm_ms) in (ts, side, tiebreak)
    order. Returns (emits, keep, fts, fv):

    - ``emits`` — (left_id, ts_us, matched_value, matched_ts_us) per
      mature LEFT row (floor at its position in the walk);
    - ``keep`` — the immature remainder (this is the eviction: mature
      rows leave the state; only the floor survives them);
    - ``fts, fv`` — the carry-forward floor after the mature rights.

    Buffer rows are (ts_us, side, left_id, value); side 0 = right,
    1 = left. At equal timestamps rights sort first (inclusive
    backward semantics, as in the batch operator); right ties resolve
    by greatest value.
    """
    from .maturity import split_mature

    mature, keep = split_mature(
        buf, wm_ms,
        key=lambda r: (
            r[0], r[1],
            r[3] if r[1] == 0 and r[3] is not None else 0.0,
            r[2] if r[2] is not None else 0,
        ),
    )
    emits = []
    for t, s, i, v in mature:
        if s == 0:
            if fts is None or t >= fts:
                fts, fv = t, v
        else:
            emits.append((i, t, fv, fts))
    return emits, keep, fts, fv


def _asof_fn(tol_us: int | None):
    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            fts, fv, bts, bside, bid, bv = state.get
            buf = list(zip(bts, bside, bid, bv))
        else:
            fts, fv, buf = None, None, []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = [int(t.value // 1000)
                         for t in pd.to_datetime(pdf["_t"])]
                for t, s, i, v in zip(ts_us, pdf["_side"], pdf["_lid"],
                                      pdf["_v"]):
                    buf.append((
                        t, int(s),
                        None if pd.isna(i) else int(i),
                        None if pd.isna(v) else float(v),
                    ))
        wm_ms = state.getCurrentWatermarkMs()
        emits, keep, fts, fv = _asof_step(buf, fts, fv, wm_ms)
        state.update((
            fts, fv,
            [r[0] for r in keep], [r[1] for r in keep],
            [r[2] for r in keep], [r[3] for r in keep],
        ))
        schedule_flush(state, keep, wm_ms)
        if emits:
            mv, mt = [], []
            for _, t, v, ft in emits:
                if ft is not None and tol_us is not None \
                        and t - ft > tol_us:
                    v, ft = None, None
                mv.append(float("nan") if v is None else float(v))
                mt.append(pd.NaT if ft is None
                          else pd.Timestamp(ft, unit="us"))
            # explicit dtypes: an all-None object column would make
            # pyspark's batch concat warn and the output dtype unstable
            yield pd.DataFrame({
                "key": [k] * len(emits),
                "left_id": pd.Series([e[0] for e in emits],
                                     dtype="int64"),
                "ts": pd.Series(
                    [pd.Timestamp(e[1], unit="us") for e in emits],
                    dtype="datetime64[ns]"),
                "matched_value": pd.Series(mv, dtype="float64"),
                "matched_ts": pd.Series(mt, dtype="datetime64[ns]"),
            })

    return fn


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    left_id_col: str,
    value_col: str,
    delay: str = "0 seconds",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join of two STREAMS (see module doc).

    ``left`` rows ``(key_col, ts_col, left_id_col)`` each gain the
    most recent ``right`` row's ``value_col`` (and its timestamp) with
    right ts <= left ts on the same key. Emission is append-mode and
    watermark-gated by ``delay`` — a left row is emitted once its
    event time is final, so the result equals the batch
    :func:`~..operators.temporal.asof_join` for any micro-batching of
    in-watermark data. Output columns: ``(key, left_id, ts,
    matched_value, matched_ts)`` with ``key``/``left_id``/``ts``
    renamed to the input column names.

    ``tolerance_seconds`` voids matches further than the tolerance
    from the left timestamp (``pandas.merge_asof(tolerance=...)``),
    applied at emission time.
    """
    from pyspark.sql import types as T

    for df, cols in ((left, (key_col, ts_col, left_id_col)),
                     (right, (key_col, ts_col, value_col))):
        for c in cols:
            if c not in df.columns:
                raise ValueError(f"streaming_asof_join: column {c!r} "
                                 "missing on an input")
    if not isinstance(left.schema[ts_col].dataType, T.TimestampType):
        left = left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not isinstance(right.schema[ts_col].dataType, T.TimestampType):
        right = right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    key_t = left.schema[key_col].dataType.simpleString()
    lid_t = left.schema[left_id_col].dataType.simpleString()
    if lid_t not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError("streaming_asof_join: left_id_col must be "
                         f"integral, got {lid_t}")
    l = left.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.col(left_id_col).cast("long").alias("_lid"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_side"),
    )
    r = right.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_t"),
        F.lit(None).cast("long").alias("_lid"),
        F.col(value_col).cast("double").alias("_v"),
        F.lit(0).alias("_side"),
    )
    u = l.unionByName(r).withWatermark("_t", delay)
    tol_us = (None if tolerance_seconds is None
              else int(tolerance_seconds * 1_000_000))
    out_schema = (
        f"key {key_t}, left_id long, ts timestamp, "
        "matched_value double, matched_ts timestamp"
    )
    out = u.groupBy("_k").applyInPandasWithState(
        _asof_fn(tol_us),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        F.col("key").alias(key_col),
        F.col("left_id").alias(left_id_col),
        F.col("ts").alias(ts_col),
        "matched_value", "matched_ts",
    )
