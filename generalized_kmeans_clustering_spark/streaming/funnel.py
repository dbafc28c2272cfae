"""Watermarked streaming funnel: real-time conversion completions.

Streaming twin of :func:`..operators.rollup.funnel_rollup`'s
per-entity stage chain. The batch operator reports per-stage counts
over a finished table; the streaming shape event pipelines want is
the CONVERSION STREAM — one appended row per entity the moment it
completes the ordered funnel, watermark-correct under out-of-order
arrival.

Semantics (identical to the batch chain, test- and oracle-asserted):
stage 0's time is the entity's first stage-0 event; stage i counts
only STRICTLY after stage i-1's time (first qualifying event wins);
``max_span_seconds`` additionally requires every stage to land within
that span of the stage-0 time. An entity emits AT MOST ONCE — when
its final stage time resolves — carrying all k stage timestamps.
Entities that never complete emit nothing (their partial progress is
queryable from the batch operator on the at-rest table).

State per entity: the k stage timestamps (+ done flag) and the
in-watermark-horizon buffer of this entity's funnel-typed events —
events buffer only until the watermark matures them, then fold into
the O(k) chain state and are EVICTED, so state is k + horizon × rate,
never history (the streaming_asof_join bound; completed/partial
entities leave a k-array tail bounded by entity cardinality).
Event-time timeouts flush keys when the watermark advances without
new input — availableNow replay therefore emits exactly the batch
operator's completed-entity set (the batch-parity oracle recipe).
Late events (older than the watermark on arrival) are dropped;
emitted completions are never retracted.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .maturity import schedule_flush

__all__ = ["streaming_funnel", "funnel_replay_flush"]


def funnel_replay_flush(
    df: DataFrame,
    streamed: DataFrame,
    stages,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
) -> DataFrame:
    """Terminal flush for a BOUNDED (availableNow) replay of
    :func:`streaming_funnel`: the completions the stream held back —
    entities whose final stage time sits in the stream's terminal
    watermark millisecond (the :mod:`.maturity` boundary, which
    Spark's strict ``timeout < watermark`` rule never fires) — in the
    streaming output schema, so ``streamed UNION flush`` equals
    :func:`~..operators.rollup.funnel_completions` of the replayed
    window exactly. Same post-replay construction (and the same
    reason it must live outside the query) as
    :func:`.asof.asof_replay_flush`: recompute the batch twin over
    the bounded data the replay consumed, null-safe anti-join the
    streamed sink on the entity. Cost: one window pass over the
    replayed window + one anti-join on the entity key."""
    from ..operators.rollup import funnel_completions

    batch = funnel_completions(
        df, stages, entity_col=entity_col, ts_col=ts_col,
        type_col=type_col, max_span_seconds=max_span_seconds)
    seen = streamed.select(F.col(entity_col).alias("_s_e"))
    return batch.join(
        seen, F.col(entity_col).eqNullSafe(F.col("_s_e")), "left_anti")


def _funnel_step(buf, times, done, wm_ms, span_us):
    """Pure core: fold the buffer's mature slice ((ts_us, stage_idx)
    with ts//1000 <= wm_ms, walked in (ts, stage) order) into the
    first-touch chain ``times`` (list of k Optional[ts_us]). Returns
    (completed_now, keep, times, done) — ``keep`` is the immature
    remainder (mature rows are evicted), ``completed_now`` is True
    exactly when this fold set the final stage time on a previously
    incomplete chain."""
    from .maturity import split_mature

    mature, keep = split_mature(buf, wm_ms)
    completed_now = False
    for t, j in mature:
        if done:
            continue
        if j == 0:
            if times[0] is None:
                times[0] = t
        elif times[j] is None and times[j - 1] is not None \
                and t > times[j - 1]:
            if span_us is not None and t - times[0] > span_us:
                continue
            times[j] = t
            if j == len(times) - 1:
                done = True
                completed_now = True
    return completed_now, keep, times, done


def _funnel_fn(k: int, span_us: int | None):
    def fn(key, pdf_iter: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (entity,) = key
        if state.exists:
            st = state.get
            times = [None if t < 0 else int(t) for t in st[0]]
            done = bool(st[1])
            buf = list(zip(st[2], st[3]))
        else:
            times, done, buf = [None] * k, False, []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = [int(t.value // 1000)
                         for t in pd.to_datetime(pdf["_t"])]
                buf.extend(zip(ts_us, (int(j) for j in pdf["_stage"])))
        wm_ms = state.getCurrentWatermarkMs()
        completed_now, keep, times, done = _funnel_step(
            buf, times, done, wm_ms, span_us)
        if done:
            keep = []  # a completed entity never needs its buffer again
        state.update((
            [-1 if t is None else t for t in times], done,
            [r[0] for r in keep], [r[1] for r in keep],
        ))
        if not done:
            schedule_flush(state, keep, wm_ms)
        if completed_now:
            row = {"entity": [entity]}
            for i in range(k):
                row[f"t_{i}"] = [pd.Timestamp(times[i], unit="us")]
            yield pd.DataFrame(row)

    return fn


def streaming_funnel(
    stream: DataFrame,
    stages,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_span_seconds: float | None = None,
    delay: str = "0 seconds",
) -> DataFrame:
    """Append-mode stream of funnel COMPLETIONS (see module doc):
    one row ``(entity, t_0 … t_{k-1})`` per entity, emitted when its
    final stage time becomes watermark-final. Column ``entity`` is
    renamed to ``entity_col``; ``t_i`` is stage i's first-touch
    timestamp. ``stages`` takes the batch contract — event-type
    strings or ``(label, predicate)`` pairs
    (:func:`~..operators.rollup.funnel_stage_predicates`); an event
    matching several stage predicates buffers once per matching stage,
    preserving exact batch parity."""
    from pyspark.sql import types as T

    from ..operators.rollup import funnel_stage_predicates

    stages = list(stages)
    if len(stages) < 2:
        raise ValueError("streaming_funnel: need at least 2 stages")
    labels, preds = funnel_stage_predicates(stages, type_col)
    for c in (entity_col, ts_col):
        if c not in stream.columns:
            raise ValueError(f"streaming_funnel: column {c!r} missing")
    # ANY string stage references type_col (a mixed string+predicate
    # spec too, not just all-string — all() here skipped the friendly
    # error and let F.col(type_col) fail later as an AnalysisException)
    if any(isinstance(s, str) for s in stages) \
            and type_col not in stream.columns:
        raise ValueError(f"streaming_funnel: column {type_col!r} missing")
    if not isinstance(stream.schema[ts_col].dataType, T.TimestampType):
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    k = len(labels)
    ent_t = stream.schema[entity_col].dataType.simpleString()
    # one buffered row per MATCHING stage (predicates may overlap —
    # the batch chain evaluates each stage's predicate independently,
    # so an event qualifying for two stages must reach the state op
    # under both indices); non-matching events drop at the explode,
    # which is also the state-input shrink the isin filter used to do
    stage_matches = F.filter(
        F.array(*[F.when(p, F.lit(i).cast("int"))
                  for i, p in enumerate(preds)]),
        lambda x: x.isNotNull())
    src = (
        stream.select(
            F.col(entity_col).alias("_e"),
            F.col(ts_col).alias("_t"),
            F.explode(stage_matches).alias("_stage"),
        )
        .withWatermark("_t", delay)
    )
    span_us = (None if max_span_seconds is None
               else int(max_span_seconds * 1_000_000))
    out_schema = f"entity {ent_t}, " + ", ".join(
        f"t_{i} timestamp" for i in range(k))
    state_schema = ("times array<long>, done boolean, "
                    "bts array<long>, bstage array<int>")
    out = src.groupBy("_e").applyInPandasWithState(
        _funnel_fn(k, span_us),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.withColumnRenamed("entity", entity_col)
