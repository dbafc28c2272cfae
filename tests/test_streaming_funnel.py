"""Watermarked streaming funnel (streaming/funnel.py): chain-core
semantics/eviction, availableNow parity with the batch chain,
max_span, late-data drop."""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.rollup import (
    funnel_rollup,
)
from generalized_kmeans_clustering_spark.streaming.funnel import (
    _funnel_step, streaming_funnel,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)


def _us(sec):
    return int((T0 + datetime.timedelta(seconds=sec)).timestamp() * 1e6)


def test_funnel_step_chain_and_eviction():
    # out-of-order arrivals; stage1 BEFORE any stage0 must not count
    buf = [(_us(5), 1), (_us(10), 0), (_us(15), 1), (_us(30), 2)]
    wm = _us(20) // 1000
    comp, keep, times, done = _funnel_step(buf, [None] * 3, False, wm, None)
    assert not comp and not done
    assert times == [_us(10), _us(15), None]
    assert keep == [(_us(30), 2)]            # mature rows evicted
    comp, keep, times, done = _funnel_step(
        keep, times, done, _us(30) // 1000, None)
    assert comp and done and keep == []
    assert times == [_us(10), _us(15), _us(30)]
    # done chains ignore later events and never re-complete
    comp, keep, times, done = _funnel_step(
        [(_us(40), 0)], times, done, _us(50) // 1000, None)
    assert not comp and done and keep == []


def test_funnel_step_strict_order_and_span():
    # equal timestamp does NOT advance (strict >)
    comp, _, times, _ = _funnel_step(
        [(_us(1), 0), (_us(1), 1)], [None, None], False,
        _us(9) // 1000, None)
    assert times == [_us(1), None] and not comp
    # span: stage-1 beyond max_span of stage-0 skipped, later one lands
    comp, _, times, done = _funnel_step(
        [(_us(0), 0), (_us(100), 1)], [None, None], False,
        _us(200) // 1000, 50 * 1_000_000)
    assert times == [_us(0), None] and not comp and not done


def _replay(spark, tmp_path, files, name, **kw):
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    schema = "user_id long, ts timestamp, event_type string"
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"tmp_{name}_{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_funnel(stream, ["view", "click", "buy"], **kw)
    q = (out.writeStream.format("memory").queryName(f"fun_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM fun_{name}").collect()


def test_streaming_funnel_matches_batch_completions(spark, tmp_path):
    import random

    rng = random.Random(5)
    rows = []
    for u in range(40):
        t = rng.randint(0, 50)
        for _ in range(rng.randint(1, 10)):
            rows.append((u, T0 + datetime.timedelta(seconds=t),
                         rng.choice(["view", "click", "buy", "other"])))
            t += rng.randint(1, 40)
    rows.sort(key=lambda r: r[1])
    half = len(rows) // 2
    got = _replay(spark, tmp_path, [rows[:half], rows[half:]], "parity")

    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    # batch oracle: completed entities via the funnel chain
    stages = funnel_rollup(df, ["view", "click", "buy"])
    # rebuild per-entity times with the same chain the operator uses
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    t0 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    t1 = F.min(F.when((F.col("event_type") == "click")
                      & (F.col("ts") > t0), F.col("ts"))).over(w)
    t2 = F.min(F.when((F.col("event_type") == "buy")
                      & (F.col("ts") > t1), F.col("ts"))).over(w)
    exp = (df.select("user_id", t0.alias("t0"), t1.alias("t1"),
                     t2.alias("t2"))
           .groupBy("user_id").agg(F.first("t0").alias("t0"),
                                   F.first("t1").alias("t1"),
                                   F.first("t2").alias("t2"))
           .where(F.col("t2").isNotNull()).collect())
    exp_m = {r["user_id"]: (r["t0"], r["t1"], r["t2"]) for r in exp}
    got_m = {r["user_id"]: (r["t_0"], r["t_1"], r["t_2"]) for r in got}
    assert got_m == exp_m
    assert len(got) == len(got_m)  # at most one completion per entity
    # and the batch per-stage count agrees with the completion count
    n_buy = {r["stage"]: r["n_entities"] for r in stages.collect()}["buy"]
    assert n_buy == len(got_m)


def test_streaming_funnel_max_span(spark, tmp_path):
    rows = [
        (1, T0, "view"),
        (1, T0 + datetime.timedelta(seconds=10), "click"),
        (1, T0 + datetime.timedelta(seconds=500), "buy"),   # out of span
        (2, T0, "view"),
        (2, T0 + datetime.timedelta(seconds=5), "click"),
        (2, T0 + datetime.timedelta(seconds=20), "buy"),
        (2, T0 + datetime.timedelta(seconds=600), "view"),  # advances wm
    ]
    got = _replay(spark, tmp_path, [rows], "span", max_span_seconds=60.0)
    assert {r["user_id"] for r in got} == {2}


def test_streaming_funnel_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    schema = "user_id long, ts timestamp, event_type string"
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="2 stages"):
        streaming_funnel(stream, ["view"])
    # repeated STRING stages are a revisit funnel (auto-uniquified
    # labels) — accepted; duplicate EXPLICIT pair labels still raise
    streaming_funnel(stream, ["view", "view"])
    with pytest.raises(ValueError, match="duplicate"):
        streaming_funnel(stream, [("s", "event_type = 'view'"),
                                  ("s", "event_type = 'click'")])
    with pytest.raises(ValueError, match="missing"):
        streaming_funnel(stream, ["a", "b"], entity_col="nope")
    # a MIXED spec (string + predicate pair) still references type_col:
    # the friendly error must fire when it is absent (any(), not all())
    schema2 = "user_id long, ts timestamp, value double"
    src2 = str(tmp_path / "v2")
    spark.createDataFrame([], schema2).write.parquet(src2)
    stream2 = spark.readStream.schema(schema2).parquet(src2)
    with pytest.raises(ValueError, match="event_type"):
        streaming_funnel(stream2, ["view", ("big", "value > 50")])


def test_streaming_funnel_predicate_stages_match_batch(spark, tmp_path):
    """r9 widened contract: (label, predicate) stages — including an
    OVERLAPPING predicate (an event may qualify for two stages) —
    replay to exactly the batch chain's completion set."""
    import random

    rng = random.Random(11)
    rows = []
    for u in range(30):
        t = rng.randint(0, 50)
        for _ in range(rng.randint(2, 10)):
            rows.append((u, T0 + datetime.timedelta(seconds=t),
                         rng.choice(["view", "click", "buy"]),
                         float(rng.randint(0, 100))))
            t += rng.randint(1, 30)
    rows.sort(key=lambda r: r[1])
    stages = [
        ("any_view", "event_type = 'view'"),
        # overlaps stage 3: a big buy qualifies for both
        ("engaged", "event_type = 'click' OR "
                    "(event_type = 'buy' AND value >= 50)"),
        ("big_buy", "event_type = 'buy' AND value >= 50"),
    ]

    schema = "user_id long, ts timestamp, event_type string, value double"
    src = str(tmp_path / "src_pred")
    os.makedirs(src, exist_ok=True)
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        tmp = str(tmp_path / f"tmp_pred_{i}")
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_funnel(stream, stages)
    q = (out.writeStream.format("memory").queryName("fun_pred")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_pred"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM fun_pred").collect()

    # batch reference through the SAME widened chain
    df = spark.createDataFrame(rows, schema)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    p0 = F.expr(stages[0][1])
    p1 = F.expr(stages[1][1])
    p2 = F.expr(stages[2][1])
    t0 = F.min(F.when(p0, F.col("ts"))).over(w)
    t1 = F.min(F.when(p1 & (F.col("ts") > t0), F.col("ts"))).over(w)
    t2 = F.min(F.when(p2 & (F.col("ts") > t1), F.col("ts"))).over(w)
    exp = (df.select("user_id", t0.alias("t0"), t1.alias("t1"),
                     t2.alias("t2"))
           .groupBy("user_id").agg(F.first("t0").alias("t0"),
                                   F.first("t1").alias("t1"),
                                   F.first("t2").alias("t2"))
           .where(F.col("t2").isNotNull()).collect())
    exp_m = {r["user_id"]: (r["t0"], r["t1"], r["t2"]) for r in exp}
    got_m = {r["user_id"]: (r["t_0"], r["t_1"], r["t_2"]) for r in got}
    assert got_m == exp_m
    # and funnel_rollup's per-stage count agrees on the final stage
    n_final = {r["stage"]: r["n_entities"]
               for r in funnel_rollup(df, stages).collect()}["big_buy"]
    assert n_final == len(exp_m)


def test_funnel_rollup_predicate_stages(spark):
    """Batch widened contract: predicate stages + label validation."""
    from generalized_kmeans_clustering_spark.operators.rollup import (
        funnel_stage_predicates,
    )

    rows = [
        (1, T0, "view", 1.0),
        (1, T0 + datetime.timedelta(seconds=1), "buy", 80.0),
        (2, T0, "view", 1.0),
        (2, T0 + datetime.timedelta(seconds=1), "buy", 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double")
    out = {r["stage"]: r["n_entities"] for r in funnel_rollup(
        df, ["view", ("big_buy", "event_type = 'buy' AND value >= 50")],
    ).collect()}
    assert out == {"view": 2, "big_buy": 1}
    # mixed string/predicate stages share one resolution path
    labels, preds = funnel_stage_predicates(
        ["view", ("big", F.col("value") >= 50)], "event_type")
    assert labels == ["view", "big"]
    with pytest.raises(ValueError, match="duplicate"):
        funnel_stage_predicates(["a", ("a", "value > 0")], "event_type")


def test_streaming_funnel_revisit_duplicate_string_stages(spark, tmp_path):
    """Revisit funnel (r10: duplicate STRING stages auto-uniquify
    instead of raising): ['view', 'click', 'view'] streamed equals
    the batch chain's completion set — stage 2 is a view STRICTLY
    after the first click."""
    import random

    rng = random.Random(23)
    rows = []
    for u in range(25):
        t = rng.randint(0, 40)
        for _ in range(rng.randint(2, 8)):
            rows.append((u, T0 + datetime.timedelta(seconds=t),
                         rng.choice(["view", "click", "buy"]), 0.0))
            t += rng.randint(1, 25)
    rows.sort(key=lambda r: r[1])
    schema = "user_id long, ts timestamp, event_type string, value double"
    src = str(tmp_path / "src_rev")
    os.makedirs(src, exist_ok=True)
    half = len(rows) // 2
    for i, chunk in enumerate([rows[:half], rows[half:]]):
        tmp = str(tmp_path / f"tmp_rev_{i}")
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = streaming_funnel(stream, ["view", "click", "view"])
    q = (out.writeStream.format("memory").queryName("fun_rev")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_rev"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM fun_rev").collect()

    df = spark.createDataFrame(rows, schema)
    from pyspark.sql import Window
    w = Window.partitionBy("user_id")
    t0 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    t1 = F.min(F.when((F.col("event_type") == "click")
                      & (F.col("ts") > t0), F.col("ts"))).over(w)
    t2 = F.min(F.when((F.col("event_type") == "view")
                      & (F.col("ts") > t1), F.col("ts"))).over(w)
    exp = (df.select("user_id", t0.alias("t0"), t1.alias("t1"),
                     t2.alias("t2"))
           .groupBy("user_id").agg(F.first("t0").alias("t0"),
                                   F.first("t1").alias("t1"),
                                   F.first("t2").alias("t2"))
           .where(F.col("t2").isNotNull()).collect())
    exp_m = {r["user_id"]: (r["t0"], r["t1"], r["t2"]) for r in exp}
    got_m = {r["user_id"]: (r["t_0"], r["t_1"], r["t_2"]) for r in got}
    assert got_m == exp_m and len(exp_m) > 0
    # the batch rollup on the same spec reports the uniquified label
    n_final = {r["stage"]: r["n_entities"]
               for r in funnel_rollup(df, ["view", "click", "view"])
               .collect()}["view#2"]
    assert n_final == len(exp_m)


def test_funnel_replay_flush_recovers_terminal_ms(spark, tmp_path):
    """Flush contract (r10): streamed ∪ funnel_replay_flush ==
    funnel_completions, disjointly — including a completion whose
    final stage sits in the stream's terminal watermark millisecond
    (held by the maturity boundary)."""
    from generalized_kmeans_clustering_spark.operators.rollup import (
        funnel_completions,
    )
    from generalized_kmeans_clustering_spark.streaming.funnel import (
        funnel_replay_flush,
    )

    ms = datetime.timedelta(milliseconds=1)
    base = [
        (1, T0, "view"),
        (1, T0 + datetime.timedelta(seconds=10), "click"),
        (1, T0 + datetime.timedelta(seconds=20), "buy"),
        (2, T0, "view"),
        (2, T0 + datetime.timedelta(seconds=5), "click"),
    ]
    # user 2 completes exactly at the terminal watermark ms -> held
    edge = [(2, T0 + datetime.timedelta(seconds=20) + ms, "buy")]
    got = _replay(spark, tmp_path, [base, edge], "flush_edge")
    streamed = spark.createDataFrame(
        [(r["user_id"], r["t_0"], r["t_1"], r["t_2"]) for r in got],
        "user_id long, t_0 timestamp, t_1 timestamp, t_2 timestamp")
    df = spark.createDataFrame(
        base + edge, "user_id long, ts timestamp, event_type string")
    flushed = funnel_replay_flush(df, streamed, ["view", "click", "buy"])
    batch = funnel_completions(df, ["view", "click", "buy"])

    def keyed(frame):
        return {r["user_id"]: (r["t_0"], r["t_1"], r["t_2"])
                for r in frame.collect()}

    s, fl, b = keyed(streamed), keyed(flushed), keyed(batch)
    assert set(s) == {1} and set(fl) == {2}
    assert not set(s) & set(fl)
    assert {**s, **fl} == b
