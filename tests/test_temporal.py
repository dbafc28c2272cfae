"""operators/temporal.py — as-of join, bucketed range join, rollup
cascade — plus text_features.chunk_documents.

Correctness model: pandas ``merge_asof`` (the public reference
semantics for as-of) and a naive inequality join (for the range
join), on data small enough for the naive forms.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.temporal import (
    asof_join,
    range_interval_join,
    rollup_cascade,
)
from generalized_kmeans_clustering_spark.operators.text_features import (
    chunk_documents,
)


def _frames(seed=0, n=300, m=90, keys=4):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01")
    left = pd.DataFrame({
        "k": rng.integers(0, keys, n),
        "ts": base + pd.to_timedelta(rng.integers(0, 86400, n), "s"),
        "lv": rng.normal(size=n).round(3),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, keys, m),
        "rts": base + pd.to_timedelta(rng.integers(0, 86400, m), "s"),
        "price": rng.normal(size=m).round(3),
    }).drop_duplicates(["k", "rts"])
    return left, right


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, direction):
    lp, rp = _frames()
    got = (
        asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                  "k", "ts", "rts", ["price"], direction=direction)
        .toPandas()
    )
    exp = pd.merge_asof(
        lp.sort_values("ts"),
        rp.rename(columns={"rts": "mts"}).sort_values("mts"),
        left_on="ts", right_on="mts", by="k", direction=direction,
    )
    g = _sorted(got, ["k", "ts", "lv"])[["k", "ts", "lv", "price"]]
    e = _sorted(exp, ["k", "ts", "lv"])[["k", "ts", "lv", "price"]]
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    # matched_ts reports the matched right timestamp, NULL if unmatched
    m = _sorted(got, ["k", "ts", "lv"])["matched_ts"]
    pd.testing.assert_series_equal(
        m.isna(), e["price"].isna(), check_names=False)


def test_asof_tolerance(spark):
    lp, rp = _frames(seed=1)
    got = (
        asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                  "k", "ts", "rts", ["price"], tolerance_seconds=900)
        .toPandas()
    )
    exp = pd.merge_asof(
        lp.sort_values("ts"),
        rp.rename(columns={"rts": "mts"}).sort_values("mts"),
        left_on="ts", right_on="mts", by="k",
        tolerance=pd.Timedelta("900s"),
    )
    g = _sorted(got, ["k", "ts", "lv"])[["k", "ts", "lv", "price"]]
    e = _sorted(exp, ["k", "ts", "lv"])[["k", "ts", "lv", "price"]]
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert g["price"].isna().any()  # tolerance actually voided matches


def test_asof_equal_ts_inclusive_and_atomic_null_payload(spark):
    # right rows exactly AT the left ts must match (inclusive), and a
    # legitimately-NULL payload column must NOT be back-filled from an
    # older right row (the struct carry is row-atomic).
    t0 = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    t10 = pd.Timestamp("2024-01-01 00:00:10").to_pydatetime()
    left = spark.createDataFrame([(1, t10)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t0, 5.0, "old"), (1, t10, None, "new")],
        "k long, rts timestamp, price double, tag string",
    )
    row = asof_join(left, right, "k", "ts", "rts",
                    ["price", "tag"]).collect()[0]
    assert row.tag == "new" and row.price is None
    assert row.matched_ts == t10


def test_asof_tiebreak_deterministic(spark):
    t0 = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    t1h = pd.Timestamp("2024-01-01 01:00:00").to_pydatetime()
    left = spark.createDataFrame([(1, t1h)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t0, 1, "a"), (1, t0, 2, "b"), (1, t0, 3, "c")],
        "k long, rts timestamp, seq int, tag string",
    )
    row = asof_join(left, right, "k", "ts", "rts", ["tag"],
                    tiebreak_col="seq").collect()[0]
    assert row.tag == "c"  # greatest tiebreak wins for backward
    row_f = asof_join(left.withColumn("ts", F.lit(t0).cast("timestamp")),
                      right, "k", "ts", "rts", ["tag"],
                      direction="forward", tiebreak_col="seq").collect()[0]
    assert row_f.tag == "a"  # least tiebreak wins for forward


def test_asof_column_clash_raises(spark):
    lp, rp = _frames()
    L = spark.createDataFrame(lp).withColumn("price", F.lit(0))
    with pytest.raises(ValueError, match="already exist"):
        asof_join(L, spark.createDataFrame(rp), "k", "ts", "rts", ["price"])


def test_asof_single_shuffle(spark):
    lp, rp = _frames()
    plan = asof_join(
        spark.createDataFrame(lp), spark.createDataFrame(rp),
        "k", "ts", "rts", ["price"],
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


@pytest.mark.parametrize("bucket_seconds", [600.0, 3600.0, 86400.0])
def test_range_join_matches_naive(spark, bucket_seconds):
    rng = np.random.default_rng(2)
    base = pd.Timestamp("2024-03-01")
    pts = pd.DataFrame({
        "k": rng.integers(0, 4, 250),
        "ts": base + pd.to_timedelta(rng.integers(0, 86400, 250), "s"),
        "v": rng.normal(size=250).round(3),
    })
    iv = pd.DataFrame({
        "ik": rng.integers(0, 4, 40),
        "s": base + pd.to_timedelta(rng.integers(0, 80000, 40), "s"),
    })
    iv["e"] = iv["s"] + pd.to_timedelta(rng.integers(1, 20000, 40), "s")
    iv["iid"] = np.arange(len(iv))
    got = range_interval_join(
        spark.createDataFrame(pts), spark.createDataFrame(iv),
        "k", "ik", "ts", "s", "e", bucket_seconds=bucket_seconds,
    ).toPandas()
    naive = pts.merge(iv, left_on="k", right_on="ik")
    naive = naive[(naive.ts >= naive.s) & (naive.ts < naive.e)]
    g = _sorted(got, ["iid", "ts", "v"])[["k", "ts", "v", "iid"]]
    e = _sorted(naive, ["iid", "ts", "v"])[["k", "ts", "v", "iid"]]
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_range_join_boundaries_and_left(spark):
    t0 = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    t60 = pd.Timestamp("2024-01-01 00:01:00").to_pydatetime()
    pts = spark.createDataFrame(
        [(1, t0), (1, t60), (2, t0)], "k long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, t0, t60, 7)],
        "ik long, s timestamp, e timestamp, iid long",
    )
    inner = range_interval_join(
        pts, iv, "k", "ik", "ts", "s", "e", bucket_seconds=10.0).toPandas()
    # half-open: the point AT start matches, the point AT end does not
    assert len(inner) == 1 and inner.ts[0] == t0
    left = range_interval_join(
        pts, iv, "k", "ik", "ts", "s", "e",
        bucket_seconds=10.0, how="left").toPandas()
    assert len(left) == 3 and left.iid.notna().sum() == 1


def test_range_join_no_duplicate_pairs_across_buckets(spark):
    # interval spanning many buckets still yields each pair ONCE
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    pts = spark.createDataFrame(
        [(1, (t0 + pd.Timedelta(seconds=s)).to_pydatetime())
         for s in range(0, 1000, 100)],
        "k long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(1, t0.to_pydatetime(),
          (t0 + pd.Timedelta("1000s")).to_pydatetime(), 0)],
        "ik long, s timestamp, e timestamp, iid long",
    )
    got = range_interval_join(pts, iv, "k", "ik", "ts", "s", "e",
                              bucket_seconds=10.0).toPandas()
    assert len(got) == 10 == got[["ts", "iid"]].drop_duplicates().shape[0]


def test_rollup_cascade_equals_direct(spark):
    rng = np.random.default_rng(3)
    ev = pd.DataFrame({
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 86400 * 3, 400), "s"),
        "value": rng.normal(size=400),
        "g": rng.choice(["a", "b"], 400),
    })
    df = spark.createDataFrame(ev)
    got = rollup_cascade(df, "ts", "value", ("minute", "hour", "day"),
                         group_cols=["g"]).toPandas()
    parts = []
    for grain in ["minute", "hour", "day"]:
        d = (df.groupBy(F.date_trunc(grain, "ts").alias("bucket_ts"), "g")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("value").alias("sum_value"))
             .withColumn("grain", F.lit(grain)).toPandas())
        parts.append(d)
    exp = pd.concat(parts, ignore_index=True)
    cols = ["grain", "bucket_ts", "g"]
    g = _sorted(got, cols)
    e = _sorted(exp, cols)
    assert (g[cols].values == e[cols].values).all()
    assert (g.n_events.values == e.n_events.values).all()
    np.testing.assert_allclose(g.sum_value, e.sum_value, rtol=1e-9)
    np.testing.assert_allclose(
        g.avg_value, g.sum_value / g.n_events, rtol=1e-12)


def test_rollup_cascade_grain_validation(spark):
    df = spark.range(1).select(
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
        F.lit(1.0).alias("v"))
    with pytest.raises(ValueError, match="finest"):
        rollup_cascade(df, "ts", "v", ("day", "hour"))
    with pytest.raises(ValueError, match="week does not nest"):
        rollup_cascade(df, "ts", "v", ("hour", "week", "month"))
    with pytest.raises(ValueError, match="unknown grain"):
        rollup_cascade(df, "ts", "v", ("hour", "fortnight"))


def test_chunk_documents_covers_and_no_redundant_tail(spark):
    rng = np.random.default_rng(4)
    docs = pd.DataFrame({
        "doc_id": range(24),
        "text": ["".join(rng.choice(list("abcdef "), rng.integers(1, 400)))
                 for _ in range(23)] + [None],
    })
    size, overlap = 50, 10
    out = chunk_documents(spark.createDataFrame(docs), size=size,
                          overlap=overlap).toPandas()
    assert out.doc_id.nunique() == 23  # NULL text yields no chunks
    step = size - overlap
    for did, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_id")
        text = docs.text[did]
        # starts advance by step from 1; substrings are faithful
        assert list(grp.start) == [1 + i * step for i in range(len(grp))]
        for _, r in grp.iterrows():
            assert text[r.start - 1:r.start - 1 + size] == r.chunk
            assert r.chunk_len == len(r.chunk)
        # full coverage: last chunk reaches the end of the text
        last = grp.iloc[-1]
        assert last.start + last.chunk_len - 1 == len(text)
        # no fully-redundant tail: every chunk past the first adds
        # at least one character beyond the previous chunk's end
        ends = (grp.start + grp.chunk_len - 1).tolist()
        assert all(b > a for a, b in zip(ends, ends[1:]))


def test_chunk_documents_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    for size, ov in [(0, 0), (10, 10), (10, -1)]:
        with pytest.raises(ValueError):
            chunk_documents(df, size=size, overlap=ov)


# --- property: asof_join ≡ pandas merge_asof on arbitrary frames ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_HSET = dict(max_examples=8, deadline=None, derandomize=True)


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(1, 80),
    m=st.integers(0, 40),
    keys=st.integers(1, 5),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(**_HSET)
def test_asof_property_matches_pandas(spark_global, seed, n, m, keys,
                                      direction):
    spark = spark_global
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-06-01")
    lp = pd.DataFrame({
        "k": rng.integers(0, keys, n),
        "ts": base + pd.to_timedelta(rng.integers(0, 5000, n), "s"),
        "lv": np.arange(n),  # unique row tag
    })
    rp = pd.DataFrame({
        "k": rng.integers(0, keys, max(m, 1))[:m],
        "rts": base + pd.to_timedelta(rng.integers(0, 5000, max(m, 1)), "s")[:m],
        "price": rng.normal(size=max(m, 1)).round(3)[:m],
    }).drop_duplicates(["k", "rts"])
    if len(rp) == 0:
        rp = pd.DataFrame({"k": pd.Series([], dtype="int64"),
                           "rts": pd.Series([], dtype="datetime64[ns]"),
                           "price": pd.Series([], dtype="float64")})
    L = spark.createDataFrame(lp)
    R = (spark.createDataFrame(rp) if len(rp) else
         spark.createDataFrame([], "k long, rts timestamp, price double"))
    got = asof_join(L, R, "k", "ts", "rts", ["price"],
                    direction=direction).toPandas()
    exp = pd.merge_asof(
        lp.sort_values(["ts", "lv"]),
        rp.rename(columns={"rts": "mts"}).sort_values("mts"),
        left_on="ts", right_on="mts", by="k", direction=direction,
    )
    g = got.sort_values("lv").reset_index(drop=True)
    e = exp.sort_values("lv").reset_index(drop=True)
    assert len(g) == n  # left-join row-count invariant
    pd.testing.assert_series_equal(g["price"], e["price"],
                                   check_dtype=False)


def test_range_join_bucket_explosion_guard(spark):
    t0 = pd.Timestamp("2024-01-01").to_pydatetime()
    t1 = pd.Timestamp("2024-03-01").to_pydatetime()  # ~60 days
    pts = spark.createDataFrame([(1, t0)], "k long, ts timestamp")
    iv = spark.createDataFrame(
        [(1, t0, t1, 0)], "ik long, s timestamp, e timestamp, iid long")
    # 1s buckets x 60 days >> cap: the job fails loudly, not silently
    with pytest.raises(Exception, match="spans more than"):
        range_interval_join(pts, iv, "k", "ik", "ts", "s", "e",
                            bucket_seconds=1.0,
                            max_buckets_per_interval=1000).collect()
    # cap disabled or satisfied: works
    got = range_interval_join(pts, iv, "k", "ik", "ts", "s", "e",
                              bucket_seconds=86400.0,
                              max_buckets_per_interval=1000).collect()
    assert len(got) == 1


def test_rollup_cascade_week_must_be_last(spark):
    # regression: ('week','year') used to misfile New-Year's-week
    # events into the previous year (date_trunc('year', week_bucket))
    df = spark.createDataFrame(
        [(pd.Timestamp("2023-01-01").to_pydatetime(), 1.0)],
        "ts timestamp, v double")
    with pytest.raises(ValueError, match="week"):
        rollup_cascade(df, "ts", "v", ("week", "year"))
    with pytest.raises(ValueError, match="week"):
        rollup_cascade(df, "ts", "v", ("day", "week", "month"))
    # week as the LAST grain is fine
    out = rollup_cascade(df, "ts", "v", ("day", "week")).collect()
    assert len(out) == 2


def test_asof_matched_ts_name_collision_raises(spark):
    lp, rp = _frames()
    R = spark.createDataFrame(rp).withColumnRenamed("price", "matched_ts")
    with pytest.raises(ValueError, match="matched_ts_col"):
        asof_join(spark.createDataFrame(lp), R, "k", "ts", "rts")


def test_range_join_reserved_column_raises(spark):
    lp, rp = _frames()
    iv = spark.createDataFrame(rp).select(
        F.col("k").alias("ik"), F.col("rts").alias("s"),
        (F.col("rts") + F.expr("INTERVAL 1 HOUR")).alias("e"))
    P = spark.createDataFrame(lp).withColumn("_b", F.lit(42))
    with pytest.raises(ValueError, match="_b"):
        range_interval_join(P, iv, "k", "ik", "ts", "s", "e",
                            bucket_seconds=60.0)


def test_rollup_cascade_pins_handle(spark):
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    df = spark.createDataFrame(
        [(pd.Timestamp("2024-01-01 05:30").to_pydatetime(), 2.0)],
        "ts timestamp, v double")
    pins = Pins()
    out = rollup_cascade(df, "ts", "v", ("hour", "day"), pins=pins)
    assert len(pins) == 1
    # the handle survives composition — the old attr-on-DataFrame
    # convention vanished on any further transformation
    composed = out.where(F.col("grain") == "day")
    n = composed.count()
    assert pins.frames[0].is_cached
    pins.release()
    assert not any(f.is_cached for f in [*pins.frames] or []) \
        and len(pins) == 0
    # releasing after the action never invalidates the result
    assert composed.count() == n
    # persist=False and single-grain: nothing pinned
    p2 = Pins()
    rollup_cascade(df, "ts", "v", ("hour", "day"), persist=False, pins=p2)
    rollup_cascade(df, "ts", "v", ("hour",), pins=p2)
    assert len(p2) == 0
    # context-manager form releases on exit
    with Pins() as p3:
        rollup_cascade(df, "ts", "v", ("hour", "day"), pins=p3).count()
        held = p3.frames
        assert held[0].is_cached
    assert not held[0].is_cached
