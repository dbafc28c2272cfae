"""Watermarked streaming as-of join.

Streaming twin of :func:`..operators.temporal.asof_join` (the batch
union + carry-forward window), at the SAME contract since r9:
composite keys, any number of typed right payload columns (carried
row-atomically, like the batch payload struct), ``backward`` and
``forward`` directions, an explicit right tiebreak column, and a
match tolerance.

Mechanics: both sides are tagged and unioned into ONE keyed stateful
operator (``applyInPandasWithState``), the same construction the
batch operator uses — but here the "window" is the state store:

- Incoming rows buffer per key until the event-time watermark passes
  them (out-of-order arrivals inside the watermark horizon are safe:
  nothing is emitted until its event time is FINAL).
- **backward**: when the watermark advances, the mature slice of the
  buffer is walked in (ts, side, tiebreak) order — right rows update
  the carry-forward FLOOR (the whole payload row at once), left rows
  emit with the current floor — exactly the batch window's
  ``last(payload, ignorenulls=True)`` semantics. Only the floor
  survives eviction (any future left can still match it), so state
  per key is ``1 + rows-in-horizon``.
- **forward**: mature LEFT rows wait in a pending list; the first
  mature right at-or-after a pending left's timestamp (least ts, then
  least tiebreak — the batch forward winner) matches and emits it.
  A pending left whose ``tolerance`` horizon the watermark has passed
  emits unmatched (NULL payload, left-join semantics): no in-horizon
  right can arrive anymore. The stream cannot prove a negative about
  the FUTURE, so an unmatched left is only ever emitted once its
  deadline is watermark-final: WITHOUT a tolerance an unmatched
  trailing left stays pending forever, and even WITH one, unmatched
  lefts inside the final ``tolerance`` window of an availableNow
  replay (deadline at/after the terminal watermark) stay held — the
  batch ``asof_join`` emits those with NULL payload. Forward batch
  parity is therefore exact for matched lefts and for unmatched lefts
  whose ``ts + tolerance`` precedes the terminal watermark; a live
  deployment never ends, so every deadline eventually passes — and a
  bounded replay recovers the held rows with
  :func:`asof_replay_flush` (streamed ∪ flush == batch, exactly).
  Mature
  rights in the current watermark millisecond are retained one batch
  (a new left may still arrive inside that millisecond); state per
  key is ``pending-lefts (tolerance-bounded) + rows-in-horizon``.
- Keys with immature rows (or pending tolerance deadlines) register
  an event-time timeout, so the availableNow final no-data batch (and
  any idle period) flushes them without new input — this is what
  makes an availableNow replay reproduce the batch ``asof_join``
  exactly (see :mod:`.maturity` for the one documented terminal-
  millisecond boundary).

Late data (older than the watermark when it arrives) is dropped by
the watermark, as in every Spark stateful operator: the already-
emitted history is never rewritten. Maturity is at millisecond
granularity (Spark's watermark unit); sub-millisecond timestamp
components order within the batch walk but not across the maturity
boundary.

Right rows sharing (key, ts) resolve by the ``tiebreak_col`` ordering
(greatest wins backward, least forward — batch parity); the floor /
match comparison is on the (ts, tiebreak) pair, so a same-(ts,
tiebreak) right arriving in a LATER micro-batch never displaces the
one already folded (first arrival wins, however the stream was
micro-batched). Without a tiebreak column exact duplicates are
first-arrival-ordered — pre-dedupe the right side when other
semantics are wanted, as in the batch operator.

Payload / key / tiebreak column types: integral, float/double,
string, boolean and timestamp (timestamps travel the state store as
unix micros, converted Spark-side on both ends). Other types (dates,
decimals, nested) should be cast or encoded by the caller — rejected
explicitly, never silently mangled.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .maturity import schedule_flush, split_mature

__all__ = ["streaming_asof_join", "asof_replay_flush"]


def _tbk(tb):
    """None-safe tiebreak sort/compare key (None sorts first, i.e.
    loses backward ties and wins forward ties deterministically)."""
    return (tb is not None, tb if tb is not None else 0)


def _isna(v) -> bool:
    """None/NaN check that tolerates non-numeric scalars (strings)."""
    return v is None or (not isinstance(v, str) and pd.isna(v))


def _asof_step_bwd(buf, floor, wm_ms, tol_us):
    """Pure backward core, unit-testable without a stream: walk the
    buffer's mature slice (event-time ms <= wm_ms) in (ts, side,
    tiebreak) order. Buffer rows are ``(ts_us, side, left_id, tb,
    payload_tuple)``; side 0 = right, 1 = left (rights sort first at
    equal timestamps: inclusive backward semantics, as in the batch
    operator). Returns ``(emits, keep, floor)``:

    - ``emits`` — ``(left_id, ts_us, matched_ts_us | None,
      payload_tuple | None)`` per mature LEFT row (the floor at its
      position in the walk; voided when older than ``tol_us``);
    - ``keep`` — the immature remainder (the eviction: mature rows
      leave the state; only the floor survives them);
    - ``floor`` — ``(ts_us, tb, payload_tuple) | None`` after the
      mature rights. A mature right replaces it only when its
      (ts, tiebreak) pair is strictly greater — equal pairs keep the
      first-folded row, so ties split across micro-batches resolve
      exactly like the in-batch walk.
    """
    mature, keep = split_mature(
        buf, wm_ms, key=lambda r: (r[0], r[1], _tbk(r[3]),
                                   r[2] if r[2] is not None else 0))
    emits = []
    for t, s, lid, tb, p in mature:
        if s == 0:
            if floor is None or (t, _tbk(tb)) > (floor[0], _tbk(floor[1])):
                floor = (t, tb, p)
        else:
            if floor is not None and (tol_us is None
                                      or t - floor[0] <= tol_us):
                emits.append((lid, t, floor[0], floor[2]))
            else:
                emits.append((lid, t, None, None))
    return emits, keep, floor


def _asof_step_fwd(buf, pending, wm_ms, tol_us):
    """Pure forward core: walk the mature slice in (ts, lefts-first,
    tiebreak) order. Mature lefts join ``pending``; each mature right
    emits every pending left at-or-before it (within ``tol_us`` —
    beyond it the left emits unmatched: later rights are farther
    still). After the walk, pending lefts whose tolerance deadline
    the watermark passed emit unmatched. Mature rights in the current
    watermark millisecond are RETAINED in ``keep`` (a new left can
    still arrive with the same event-time millisecond); they re-walk
    next batch and expire once the watermark moves past their
    millisecond. Returns ``(emits, keep, pending)`` with the same
    emit shape as the backward core."""
    mature, keep = split_mature(
        buf, wm_ms, key=lambda r: (r[0], 0 if r[1] == 1 else 1,
                                   _tbk(r[3]),
                                   r[2] if r[2] is not None else 0))
    emits = []
    for t, s, lid, tb, p in mature:
        if s == 1:
            pending.append((t, lid))
        else:
            still = []
            for lt, llid in pending:
                if lt > t:          # right precedes this pending left
                    still.append((lt, llid))
                elif tol_us is not None and t - lt > tol_us:
                    emits.append((llid, lt, None, None))
                else:
                    emits.append((llid, lt, t, p))
            pending = still
            if t // 1000 >= wm_ms:
                # boundary right (in the current watermark ms): a LEFT
                # can still arrive inside this ms and must see it —
                # retain one batch and re-walk (already-matched lefts
                # left `pending`, so nothing double-emits). The mirror
                # of the backward floor surviving eviction; matching
                # now accepts the documented sub-ms maturity caveat.
                keep.append((t, s, lid, tb, p))
    if tol_us is not None:
        still = []
        for lt, llid in pending:
            if (lt + tol_us) // 1000 < wm_ms:
                emits.append((llid, lt, None, None))
            else:
                still.append((lt, llid))
        pending = still
    return emits, keep, pending


_COERCE = {"long": int, "double": float, "string": str, "boolean": bool}


def _asof_fn(m, tol_us, direction, tb_coerce, p_coerce, p_dtypes):
    """State-fn factory over ``m`` payload columns. State layout (all
    per key) —

    backward: ``(fset, fts, ftb, f0..f{m-1},
    bts, bside, bid, btb, bp0..bp{m-1})``;
    forward:  ``(pts, pid, bts, bside, bid, btb, bp0..bp{m-1})``.

    Buffer arrays zip into ``(ts, side, lid, tb, payload_tuple)``
    rows; scalars are coerced to the state type's plain Python form
    (``tb_coerce`` / ``p_coerce``: Arrow hands a nullable long column
    to pandas as float64, which the ``array<long>`` state field would
    reject) so the pure cores above stay engine-free. ``p_dtypes``
    are the emitted payload pandas dtypes (see ``_EMIT_DTYPES``)."""
    backward = direction == "backward"

    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = list(state.get)
        elif backward:
            st = [False, None, None] + [None] * m + [[], [], [], []] \
                + [[]] * m
        else:
            st = [[], []] + [[], [], [], []] + [[]] * m
        if backward:
            floor = ((st[1], st[2], tuple(st[3:3 + m]))
                     if st[0] else None)
            b0 = 3 + m
        else:
            pending = list(zip(st[0], st[1]))
            b0 = 2
        buf = [(t, s, i, tb, tuple(ps)) for t, s, i, tb, *ps in zip(
            st[b0], st[b0 + 1], st[b0 + 2], st[b0 + 3],
            *st[b0 + 4:b0 + 4 + m])]
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = [int(t.value // 1000)
                         for t in pd.to_datetime(pdf["_t"])]
                cols = [pdf["_side"], pdf["_lid"], pdf["_tb"]] + [
                    pdf[f"_p{i}"] for i in range(m)]
                for t, (s, i, tb, *ps) in zip(ts_us, zip(*cols)):
                    buf.append((
                        t, int(s),
                        None if pd.isna(i) else int(i),
                        None if _isna(tb) else tb_coerce(tb),
                        tuple(None if _isna(p) else c(p)
                              for p, c in zip(ps, p_coerce)),
                    ))
        wm_ms = state.getCurrentWatermarkMs()
        deadlines = []
        if backward:
            emits, keep, floor = _asof_step_bwd(buf, floor, wm_ms, tol_us)
            head = ([floor is not None,
                     None if floor is None else floor[0],
                     None if floor is None else floor[1]]
                    + ([None] * m if floor is None else list(floor[2])))
        else:
            emits, keep, pending = _asof_step_fwd(
                buf, pending, wm_ms, tol_us)
            head = [[p[0] for p in pending], [p[1] for p in pending]]
            if tol_us is not None:
                deadlines = [(lt + tol_us) // 1000 for lt, _ in pending]
        state.update(tuple(
            head
            + [[r[0] for r in keep], [r[1] for r in keep],
               [r[2] for r in keep], [r[3] for r in keep]]
            + [[r[4][i] for r in keep] for i in range(m)]))
        schedule_flush(state, keep, wm_ms, deadlines)
        if emits:
            yield _emit_frame(key, emits, p_dtypes)

    return fn


# state DDL type -> nullable pandas dtype for emitted payload columns
_EMIT_DTYPES = {"long": "Int64", "double": "float64",
                "string": "object", "boolean": "boolean"}


def _emit_frame(key, emits, p_dtypes):
    """Typed pandas frame for one key's emissions. Explicit dtypes:
    an all-None object column would make pyspark's batch concat warn
    and the output dtype unstable, so nullable payloads ride as
    pandas nullable dtypes (Arrow converts them per the declared
    output schema)."""
    n = len(emits)
    data = {f"k{j}": [kv] * n for j, kv in enumerate(key)}
    data["left_id"] = pd.Series([e[0] for e in emits], dtype="int64")
    data["ts"] = pd.Series([pd.Timestamp(e[1], unit="us") for e in emits],
                           dtype="datetime64[ns]")
    for i, dt in enumerate(p_dtypes):
        vals = [None if e[3] is None else e[3][i] for e in emits]
        data[f"p{i}"] = (pd.Series(vals, dtype="object") if dt == "object"
                         else pd.array(vals, dtype=dt))
    data["matched_ts"] = pd.Series(
        [pd.NaT if e[2] is None else pd.Timestamp(e[2], unit="us")
         for e in emits], dtype="datetime64[ns]")
    return pd.DataFrame(data)


# column type -> (state DDL type, needs unix-micros conversion)
_STATE_TYPES = {
    "tinyint": ("long", False), "smallint": ("long", False),
    "int": ("long", False), "bigint": ("long", False),
    "float": ("double", False), "double": ("double", False),
    "string": ("string", False), "boolean": ("boolean", False),
    "timestamp": ("long", True), "timestamp_ntz": ("long", True),
}


def _carry_spec(df: DataFrame, col: str, what: str):
    """(state_type, in_expr, restore) for a carried column — see the
    module docstring's supported-type table."""
    dt = df.schema[col].dataType.simpleString()
    if dt not in _STATE_TYPES:
        raise ValueError(
            f"streaming_asof_join: {what} column {col!r} has type {dt}; "
            "supported: integral, float/double, string, boolean, "
            "timestamp — cast or encode other types explicitly")
    state_t, is_ts = _STATE_TYPES[dt]
    if is_ts:
        in_expr = F.unix_micros(F.col(col).cast("timestamp"))
        restore = lambda c: F.timestamp_micros(c).cast(dt)  # noqa: E731
    else:
        in_expr = F.col(col).cast(state_t)
        restore = lambda c: c.cast(dt)  # noqa: E731
    return state_t, in_expr, restore


def asof_replay_flush(
    left: DataFrame,
    right: DataFrame,
    streamed: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    left_id_col: str,
    value_cols: str | Sequence[str],
    direction: str = "forward",
    tolerance_seconds: float | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Terminal flush for a BOUNDED (availableNow) replay of
    :func:`streaming_asof_join`: the rows the stream held back, in
    the streaming output schema, so that ``streamed UNION
    asof_replay_flush(...)`` equals the batch
    :func:`~..operators.temporal.asof_join` of the replayed window —
    exact batch parity with no caveats.

    Why a post-replay helper: inside ``applyInPandasWithState`` Spark
    exposes no "this was the final batch" signal — the terminal
    no-data batch fires event-time timeouts, but the terminal
    watermark never passes the stream's own maximum event time, so a
    state function can never distinguish "stream ended" from "quiet
    period" (a live stream must NOT flush: the awaited right may
    still come). The held rows are therefore recoverable only
    OUTSIDE the query, where boundedness is known. This helper
    recomputes the batch as-of over the same bounded frames the
    replay consumed and anti-joins the streamed output on
    ``(key..., left_id)`` — the difference is exactly what the
    stream held:

    - **forward, with tolerance**: unmatched lefts whose
      ``ts + tolerance`` deadline lies at/after the terminal
      watermark (the module-doc caveat) — emitted here with NULL
      payload, as batch does;
    - **forward, no tolerance**: every trailing unmatched left;
    - **either direction**: lefts in the terminal watermark
      millisecond (the :mod:`.maturity` boundary) — emitted here
      with their true batch match, closing that documented caveat
      for replays as well.

    Pass the SAME bounded left/right data the replay consumed (e.g.
    re-read the replayed files as batch frames) and the streamed
    output collected from the sink. ``left_id_col`` must identify
    left rows uniquely within a key (already required for the
    streaming emit contract). Cost: one batch as-of window pass over
    the replayed window plus one anti-join on (key, left_id) — both
    bounded by the replay's size, not the stream's history; for a
    checkpointed long-lived stream, flush with the window since the
    last checkpointed flush ONLY if no pending left can be older than
    that window (otherwise replay the full horizon).
    """
    from ..operators.temporal import asof_join

    keys = [key] if isinstance(key, str) else list(key)
    payload = ([value_cols] if isinstance(value_cols, str)
               else list(value_cols))
    batch = asof_join(
        left, right, key, ts_col, ts_col, payload,
        direction=direction, tolerance_seconds=tolerance_seconds,
        tiebreak_col=tiebreak_col)
    out = batch.select(*keys, left_id_col, ts_col, *payload, "matched_ts")
    # null-SAFE anti-join: a NULL key groups like any other value in
    # both the state op and the batch window, so a streamed NULL-key
    # row must suppress its batch twin here too (plain equality would
    # re-emit every NULL-key left as a duplicate)
    seen = streamed.select(
        *[F.col(k).alias(f"_s_{k}") for k in keys],
        F.col(left_id_col).alias("_s_id"))
    cond = F.col(left_id_col).eqNullSafe(F.col("_s_id"))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_s_{k}"))
    return out.join(seen, cond, "left_anti")


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    ts_col: str,
    left_id_col: str,
    value_cols: str | Sequence[str],
    delay: str = "0 seconds",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join of two STREAMS at the batch contract (see module
    doc and :func:`~..operators.temporal.asof_join`).

    ``left`` rows ``(key..., ts_col, left_id_col)`` each gain the
    right row's ``value_cols`` (plus its timestamp as ``matched_ts``)
    with the greatest right ts <= left ts (``direction="backward"``,
    inclusive) or the least right ts >= left ts (``"forward"``) on
    the same composite key. Emission is append-mode and watermark-
    gated by ``delay`` — a left row is emitted once its match is
    final, so the result equals the batch ``asof_join`` for any
    micro-batching of in-watermark data. Forward caveat: unmatched
    lefts flush only when ``tolerance_seconds`` is set AND their
    deadline precedes the watermark, so a BOUNDED replay holds the
    unmatched lefts of its final tolerance window (see module doc;
    recover them with :func:`asof_replay_flush`).
    Output columns: key columns, ``left_id_col``, ``ts_col``, the
    ``value_cols`` (original names and types), ``matched_ts``.

    ``tolerance_seconds`` voids matches further than the tolerance
    from the left timestamp (``pandas.merge_asof(tolerance=...)``).
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(
            "streaming_asof_join: direction must be backward|forward")
    keys = [key] if isinstance(key, str) else list(key)
    payload = ([value_cols] if isinstance(value_cols, str)
               else list(value_cols))
    if not payload:
        raise ValueError("streaming_asof_join: need >=1 value column")
    right_req = keys + [ts_col] + payload + (
        [tiebreak_col] if tiebreak_col is not None else [])
    for df, cols in ((left, keys + [ts_col, left_id_col]),
                     (right, right_req)):
        for c in cols:
            if c not in df.columns:
                raise ValueError(f"streaming_asof_join: column {c!r} "
                                 "missing on an input")
    out_names = keys + [left_id_col, ts_col] + payload + ["matched_ts"]
    if len(set(out_names)) != len(out_names):
        raise ValueError(
            f"streaming_asof_join: output columns {out_names} collide; "
            "rename inputs (matched_ts is reserved)")
    if not isinstance(left.schema[ts_col].dataType, T.TimestampType):
        left = left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if not isinstance(right.schema[ts_col].dataType, T.TimestampType):
        right = right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    lid_t = left.schema[left_id_col].dataType.simpleString()
    if lid_t not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError("streaming_asof_join: left_id_col must be "
                         f"integral, got {lid_t}")

    key_ts = [left.schema[k].dataType.simpleString() for k in keys]
    specs = [_carry_spec(right, c, "payload") for c in payload]
    if tiebreak_col is not None:
        tb_t, tb_expr, _ = _carry_spec(right, tiebreak_col, "tiebreak")
    else:
        tb_t, tb_expr = "long", F.lit(0).cast("long")
    m = len(payload)

    l = left.select(
        *[F.col(k).alias(f"_k{j}") for j, k in enumerate(keys)],
        F.col(ts_col).alias("_t"),
        F.col(left_id_col).cast("long").alias("_lid"),
        F.lit(None).cast(tb_t).alias("_tb"),
        *[F.lit(None).cast(s[0]).alias(f"_p{i}")
          for i, s in enumerate(specs)],
        F.lit(1).alias("_side"),
    )
    r = right.select(
        *[F.col(k).alias(f"_k{j}") for j, k in enumerate(keys)],
        F.col(ts_col).alias("_t"),
        F.lit(None).cast("long").alias("_lid"),
        tb_expr.alias("_tb"),
        *[s[1].alias(f"_p{i}") for i, s in enumerate(specs)],
        F.lit(0).alias("_side"),
    )
    u = l.unionByName(r).withWatermark("_t", delay)
    tol_us = (None if tolerance_seconds is None
              else int(tolerance_seconds * 1_000_000))

    state_parts = []
    if direction == "backward":
        state_parts += (["fset boolean", "fts long", f"ftb {tb_t}"]
                        + [f"f{i} {s[0]}" for i, s in enumerate(specs)])
    else:
        state_parts += ["pts array<long>", "pid array<long>"]
    state_parts += ["bts array<long>", "bside array<int>",
                    "bid array<long>", f"btb array<{tb_t}>"]
    state_parts += [f"bp{i} array<{s[0]}>" for i, s in enumerate(specs)]

    out_schema = ", ".join(
        [f"k{j} {t}" for j, t in enumerate(key_ts)]
        + ["left_id long", "ts timestamp"]
        + [f"p{i} {s[0]}" for i, s in enumerate(specs)]
        + ["matched_ts timestamp"])
    out = u.groupBy(*[f"_k{j}" for j in range(len(keys))]) \
        .applyInPandasWithState(
            _asof_fn(m, tol_us, direction, _COERCE[tb_t],
                     [_COERCE[s[0]] for s in specs],
                     [_EMIT_DTYPES[s[0]] for s in specs]),
            outputStructType=out_schema,
            stateStructType=", ".join(state_parts),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        *[F.col(f"k{j}").alias(k) for j, k in enumerate(keys)],
        F.col("left_id").cast(lid_t).alias(left_id_col),
        F.col("ts").alias(ts_col),
        *[s[2](F.col(f"p{i}")).alias(c)
          for i, (c, s) in enumerate(zip(payload, specs))],
        "matched_ts",
    )
