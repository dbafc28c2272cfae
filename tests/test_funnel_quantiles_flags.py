"""quantiles_by_key (operators/stats.py), funnel_rollup
(operators/rollup.py), propagate_flags (operators/graph.py)."""

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.graph import (
    propagate_flags,
)
from generalized_kmeans_clustering_spark.operators.rollup import (
    funnel_rollup,
)
from generalized_kmeans_clustering_spark.operators.stats import (
    quantiles_by_key,
)


def _disc_quantile(vals, q):
    s = sorted(vals)
    return s[int(np.ceil(q * len(s))) - 1]


def test_quantiles_by_key_exact(spark):
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 500),
        "v": rng.integers(0, 40, 500).astype(float),
    })
    # NULLs are dropped; a key with one value works
    df.loc[df.index[:25], "v"] = None
    df = pd.concat(
        [df, pd.DataFrame({"k": ["solo"], "v": [7.0]})], ignore_index=True)
    got = quantiles_by_key(
        spark.createDataFrame(df), "k", "v", qs=(0.25, 0.5, 0.9, 1.0),
    ).toPandas().set_index("key").sort_index()
    for k, grp in df.dropna().groupby("k"):
        vals = grp.v.tolist()
        assert got.loc[k, "n"] == len(vals)
        for q, lab in [(0.25, "q_25"), (0.5, "q_50"), (0.9, "q_90"),
                       (1.0, "q_100")]:
            assert got.loc[k, lab] == _disc_quantile(vals, q), (k, q)
    assert got.loc["solo", "q_50"] == 7.0


def test_quantiles_by_key_duplicates_collapse_and_validation(spark):
    # heavy duplicate mass (the skew case the pre-collapse handles)
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["x"] * 100, "v": [5.0] * 99 + [9.0]}))
    row = quantiles_by_key(df, "k", "v", qs=(0.5, 0.99, 1.0)).collect()[0]
    assert (row.n, row.q_50, row.q_99, row.q_100) == (100, 5.0, 5.0, 9.0)
    with pytest.raises(ValueError, match="outside"):
        quantiles_by_key(df, "k", "v", qs=(0.0,))
    with pytest.raises(ValueError, match="at least one"):
        quantiles_by_key(df, "k", "v", qs=())
    # 0.1 and 1.0 must NOT collide (the old fraction-digit labels did)
    row = quantiles_by_key(df, "k", "v", qs=(0.1, 1.0)).collect()[0]
    assert (row.q_10, row.q_100) == (5.0, 9.0)


def _ev(uid, sec, typ):
    return (uid, dt.datetime(2024, 1, 1, 0, 0, sec), typ)


def test_funnel_strict_order_and_first_touch(spark):
    rows = [
        # u1 completes in order
        _ev(1, 10, "view"), _ev(1, 20, "click"), _ev(1, 30, "purchase"),
        # u2 clicks BEFORE viewing — click must not count
        _ev(2, 10, "click"), _ev(2, 20, "view"),
        # u3 view+click at the same second — strict > rejects the click
        _ev(3, 10, "view"), _ev(3, 10, "click"),
        # u4 never enters the funnel
        _ev(4, 5, "purchase"),
        # u5 view -> click, purchase earlier than click
        _ev(5, 1, "view"), _ev(5, 9, "purchase"), _ev(5, 10, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.stage: (r.n_entities, r.conversion)
           for r in funnel_rollup(
               df, ["view", "click", "purchase"]).collect()}
    assert got["view"] == (4, 1.0)
    assert got["click"][0] == 2        # u1 and u5
    assert got["purchase"][0] == 1     # only u1
    assert abs(got["click"][1] - 0.5) < 1e-12
    assert abs(got["purchase"][1] - 0.25) < 1e-12


def test_funnel_max_span_and_validation(spark):
    rows = [
        _ev(1, 0, "view"), _ev(1, 5, "click"),
        _ev(2, 0, "view"), _ev(2, 50, "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.stage: r.n_entities
           for r in funnel_rollup(df, ["view", "click"],
                                  max_span_seconds=10).collect()}
    assert got == {"view": 2, "click": 1}
    with pytest.raises(ValueError, match="at least 2"):
        funnel_rollup(df, ["view"])


def test_funnel_revisit_duplicate_string_stages(spark):
    """A repeated string stage is a revisit funnel: the second 'view'
    counts a view STRICTLY after the first click, and its output
    label is auto-uniquified to 'view#2'. Explicit (label, predicate)
    duplicates still raise."""
    from generalized_kmeans_clustering_spark.operators.rollup import (
        funnel_stage_predicates,
    )

    rows = [
        # u1: view -> click -> view (completes the revisit funnel)
        _ev(1, 0, "view"), _ev(1, 5, "click"), _ev(1, 9, "view"),
        # u2: view -> click, never returns
        _ev(2, 0, "view"), _ev(2, 5, "click"),
        # u3: two views but no click between them
        _ev(3, 0, "view"), _ev(3, 9, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.stage: r.n_entities
           for r in funnel_rollup(df, ["view", "click", "view"]).collect()}
    assert got == {"view": 3, "click": 2, "view#2": 1}
    with pytest.raises(ValueError, match="duplicate"):
        funnel_stage_predicates(
            [("a", "event_type = 'x'"), ("a", "event_type = 'y'")],
            "event_type")
    # collisions involving an explicit label raise in EITHER order —
    # auto-renaming either side would silently change which stage the
    # name refers to (r11: was order-asymmetric, explicit-then-string
    # used to uniquify silently)
    with pytest.raises(ValueError, match="duplicate"):
        funnel_stage_predicates(
            [("view", "event_type = 'view'"), "view"], "event_type")
    with pytest.raises(ValueError, match="duplicate"):
        funnel_stage_predicates(
            ["view", ("view", "event_type = 'view'")], "event_type")
    # a later stage colliding with an auto-uniquified label still
    # resolves to a fresh name
    labels, _ = funnel_stage_predicates(
        ["view", "view", "view#2"], "event_type")
    assert len(set(labels)) == 3 and labels[0] == "view"


def test_funnel_empty_entry_stage(spark):
    df = spark.createDataFrame(
        [_ev(1, 0, "click")], "user_id long, ts timestamp, event_type string")
    rows = funnel_rollup(df, ["view", "click"]).collect()
    assert [r.n_entities for r in rows] == [0, 0]
    assert all(r.conversion is None for r in rows)


def _graph(spark, edges, seeds):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in seeds], "id long")
    return e, s


def test_propagate_flags_path_graph_rounds(spark):
    # path 0-1-2-3-4, seed {0}: round r reaches node r
    e, s = _graph(spark, [(i, i + 1) for i in range(4)], [0])
    got = {r.id: r.round
           for r in propagate_flags(e, s, rounds=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 is beyond 3 hops


def test_propagate_flags_undirected_min_round_and_drain(spark):
    # triangle 1-2-3 plus isolated 9; seeds {2, 9}
    e, s = _graph(spark, [(1, 2), (2, 3), (3, 1)], [2, 9])
    got = {r.id: r.round
           for r in propagate_flags(e, s, rounds=4).collect()}
    # 1 and 3 are both 1 hop from 2 (via either direction);
    # the clique drains after round 1 — no phantom later rounds
    assert got == {2: 0, 9: 0, 1: 1, 3: 1}
    with pytest.raises(ValueError, match="rounds"):
        propagate_flags(e, s, rounds=0)


def test_propagate_flags_seed_round_wins(spark):
    # both endpoints seeded: neither gets re-flagged at round 1
    e, s = _graph(spark, [(1, 2)], [1, 2])
    got = {r.id: r.round for r in propagate_flags(e, s, rounds=2).collect()}
    assert got == {1: 0, 2: 0}


def test_retention_cohorts_weekly(spark):
    from generalized_kmeans_clustering_spark.operators.rollup import (
        retention_cohorts,
    )
    # week of 2024-01-01 (Mon) and week of 2024-01-08
    rows = [
        # cohort W0: u1 active W0, W1, W2; u2 active W0, W2
        _ev(1, 0, "a"),
        (1, dt.datetime(2024, 1, 9), "a"), (1, dt.datetime(2024, 1, 16), "a"),
        (2, dt.datetime(2024, 1, 3), "a"), (2, dt.datetime(2024, 1, 17), "a"),
        # cohort W1: u3 active W1 only
        (3, dt.datetime(2024, 1, 10), "a"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {(r.cohort.date().isoformat(), r.offset): (r.n_active, r.retention)
           for r in retention_cohorts(df, "user_id", "ts", "week").collect()}
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (2, 1.0)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert len(got) == 4
    with pytest.raises(ValueError, match="period"):
        retention_cohorts(df, "user_id", "ts", "fortnight")


def test_retention_cohorts_monthly_offset_and_cap(spark):
    from generalized_kmeans_clustering_spark.operators.rollup import (
        retention_cohorts,
    )
    rows = [
        (1, dt.datetime(2024, 1, 15), "a"),
        (1, dt.datetime(2024, 3, 2), "a"),     # offset 2 months
        (1, dt.datetime(2024, 12, 30), "a"),   # offset 11
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    offs = sorted(r.offset for r in retention_cohorts(
        df, "user_id", "ts", "month").collect())
    assert offs == [0, 2, 11]
    capped = retention_cohorts(df, "user_id", "ts", "month", max_offset=3)
    assert sorted(r.offset for r in capped.collect()) == [0, 2]


def test_throttle_events(spark):
    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_events,
    )
    rows = [
        # same (user, type), same 60s window: earliest wins
        (10, 1, dt.datetime(2024, 1, 1, 0, 0, 5), "x"),
        (11, 1, dt.datetime(2024, 1, 1, 0, 0, 30), "x"),
        # next window boundary (minute 1): kept
        (12, 1, dt.datetime(2024, 1, 1, 0, 1, 0), "x"),
        # different type: own budget
        (13, 1, dt.datetime(2024, 1, 1, 0, 0, 10), "y"),
        # tie on ts: event_id tiebreak keeps the lower id
        (15, 2, dt.datetime(2024, 1, 1, 0, 0, 0), "x"),
        (14, 2, dt.datetime(2024, 1, 1, 0, 0, 0), "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    kept = sorted(r.event_id for r in throttle_events(
        df, ("user_id", "event_type"), "ts", window_seconds=60.0,
        tiebreak_col="event_id").collect())
    assert kept == [10, 12, 13, 14]
    with pytest.raises(ValueError, match="window_seconds"):
        throttle_events(df, ("user_id",), "ts", window_seconds=0)


def test_throttle_reserved_columns_raise(spark):
    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_events,
    )
    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "x", 42)],
        "event_id long, user_id long, ts timestamp, event_type string,"
        " _bucket long")
    with pytest.raises(ValueError, match="_bucket"):
        throttle_events(df, ("user_id",), "ts", 60.0)


def test_quantiles_rank_rounding_grid(spark):
    # q*n in binary floats can land just above the exact integer
    # (0.07*100 = 7.000000000000001 -> ceil 8): the rank must snap to
    # the decimal value. value == rank makes the expectation direct.
    import math
    from fractions import Fraction

    for n in (7, 13, 31, 100):
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * n,
                          "v": [float(i) for i in range(1, n + 1)]}))
        qs = tuple(round(i / 100, 2) for i in range(1, 100, 3)) + (1.0,)
        got = quantiles_by_key(df, "k", "v", qs=qs).collect()[0].asDict()
        for q in qs:
            lab = ("%g" % (q * 100)).replace(".", "_")
            exp = math.ceil(Fraction(str(q)) * n)
            assert got[f"q_{lab}"] == float(exp), (n, q)


def test_quantiles_by_key_approx_and_auto(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 100,
                      "v": [float(i) for i in range(100)]}))
    exact = quantiles_by_key(df, "k", "v", qs=(0.5, 0.9)).collect()[0]
    approx = quantiles_by_key(
        df, "k", "v", qs=(0.5, 0.9), method="approx").collect()[0]
    assert approx.n == 100
    assert abs(approx.q_50 - exact.q_50) <= 1.0
    assert abs(approx.q_90 - exact.q_90) <= 1.0
    # auto: below the distinct-per-key threshold -> exact window path
    lo = quantiles_by_key(
        df, "k", "v", qs=(0.5,), method="auto",
        auto_distinct_threshold=1000).collect()[0]
    assert lo.q_50 == exact.q_50
    # at/above the threshold (100 distinct >= 100) -> approx path
    hi = quantiles_by_key(
        df, "k", "v", qs=(0.5,), method="auto",
        auto_distinct_threshold=100).collect()[0]
    assert abs(hi.q_50 - exact.q_50) <= 1.0
    with pytest.raises(ValueError, match="method"):
        quantiles_by_key(df, "k", "v", method="nope")


def test_quantiles_approx_rank_error_bound(spark):
    """The approx path's contract is the Greenwald–Khanna guarantee:
    the returned value's rank is within n/approx_accuracy of the
    target rank. Deliberately NOT oracle-attested (sketch ranks are
    engine-specific), so this property check is the only regression
    gate on a wrong-accuracy routing change — randomized distributions
    (uniform dup-heavy, zipf-ish head, constant-heavy) at two
    accuracies."""
    import random

    for seed, shape in [(1, "uniform"), (2, "zipf"), (3, "constant")]:
        rng = random.Random(seed)
        n = 4000
        if shape == "uniform":
            vals = [float(rng.randint(0, 500)) for _ in range(n)]
        elif shape == "zipf":
            vals = [float(int(1.0 / (rng.random() + 1e-4))) for _ in
                    range(n)]
        else:
            vals = [0.0] * (n // 2) + [float(rng.randint(0, 50))
                                       for _ in range(n - n // 2)]
        df = spark.createDataFrame(
            pd.DataFrame({"k": ["a"] * n, "v": vals}))
        svals = sorted(vals)
        for acc in (100, 10_000):
            got = quantiles_by_key(
                df, "k", "v", qs=(0.1, 0.5, 0.9, 0.99),
                method="approx", approx_accuracy=acc).collect()[0]
            tol = n / acc + 1                     # +1: rank-rounding slack
            for q, lab in [(0.1, "q_10"), (0.5, "q_50"),
                           (0.9, "q_90"), (0.99, "q_99")]:
                v = got[lab]
                # rank interval the returned value occupies (1-based)
                lo = svals.index(v) + 1
                hi = n - svals[::-1].index(v)
                target = math.ceil(q * n)
                assert lo - tol <= target <= hi + tol, (
                    shape, acc, q, v, lo, hi, target)


def test_quantiles_routing_plan_shapes(spark):
    """SCALE claim: the approx route is ONE aggregation (no per-key
    sort window); the exact route ranks over a Window. Plan-asserted
    so a refactor can't silently reintroduce the per-key sort on the
    approx path."""
    df = spark.createDataFrame(
        pd.DataFrame({"k": ["a", "b"] * 50,
                      "v": [float(i) for i in range(100)]}))
    exact_plan = quantiles_by_key(
        df, "k", "v", qs=(0.5,))._jdf.queryExecution() \
        .executedPlan().toString()
    approx_plan = quantiles_by_key(
        df, "k", "v", qs=(0.5,), method="approx")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" in exact_plan
    assert "Window" not in approx_plan
    assert "percentile_approx" in approx_plan.lower() \
        or "approx" in approx_plan.lower()


def test_propagate_flags_pins_handle(spark):
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    s = spark.createDataFrame([(1,)], "id long")
    pins = Pins()
    out = propagate_flags(e, s, rounds=4, id_col="id",
                          src_col="src", dst_col="dst", pins=pins)
    # the handle survives composition — the old attr-on-DataFrame
    # convention vanished on out.filter(...)
    composed = out.where(F.col("round") >= 0)
    assert composed.count() == 5
    # multi-round walks pin the symmetrized edge list, the seed round
    # and every REUSED frontier (rounds-1 of them; the final frontier
    # is a single union branch, never re-read), released explicitly in
    # long-lived sessions: rounds=4 -> sym + round0 + frontiers 1..3
    held = pins.frames
    assert len(held) == 5 and all(p.is_cached for p in held)
    pins.release()
    assert not any(p.is_cached for p in held) and len(pins) == 0
    # releasing after the action never invalidates the result
    assert composed.count() == 5
    # rounds=2 still pins sym + round0 + the reused first frontier
    p2 = Pins()
    propagate_flags(e, s, rounds=2, id_col="id",
                    src_col="src", dst_col="dst", pins=p2).count()
    assert len(p2) == 3
    # single-hop walks have no reuse at all — nothing pinned
    p1 = Pins()
    propagate_flags(e, s, rounds=1, id_col="id",
                    src_col="src", dst_col="dst", pins=p1).count()
    assert len(p1) == 0


def test_filter_by_group_quantile(spark):
    from generalized_kmeans_clustering_spark.operators.stats import (
        filter_by_group_quantile,
    )

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 11)]      # a: 1..10
        + [("b", 100 + i, float(i) / 10) for i in range(1, 5)],  # b: .1..4
        "k string, id long, v double")
    # median of a = 5.0 (ceil(0.5*10)=rank 5); of b = 0.2 (rank 2)
    kept = filter_by_group_quantile(df, "k", "v", q=0.5, keep="above")
    got = {(r["k"], r["id"]) for r in kept.collect()}
    assert got == ({("a", i) for i in range(5, 11)}
                   | {("b", 100 + i) for i in range(2, 5)})
    below = filter_by_group_quantile(df, "k", "v", q=0.5, keep="below")
    gb = {(r["k"], r["id"]) for r in below.collect()}
    assert gb == ({("a", i) for i in range(1, 6)}
                  | {("b", 100 + i) for i in range(1, 3)})
    # NULL/NaN values never survive (same population rule as
    # quantiles_by_key)
    withnan = df.union(spark.createDataFrame(
        [("a", 999, float("nan")), ("b", 998, None)],
        "k string, id long, v double"))
    kept2 = {(r["k"], r["id"])
             for r in filter_by_group_quantile(
                 withnan, "k", "v", q=0.5).collect()}
    assert kept2 == got
    with pytest.raises(ValueError, match="keep"):
        filter_by_group_quantile(df, "k", "v", keep="sideways")


def test_filter_by_group_quantile_broadcasts_thresholds(spark):
    """The thresholds frame (one row per group) must ride a broadcast
    hash join — the filter itself adds no shuffle of the corpus."""
    from generalized_kmeans_clustering_spark.operators.stats import (
        filter_by_group_quantile,
    )

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 30)],
        "k string, id long, v double")
    plan = (filter_by_group_quantile(df, "k", "v", q=0.9)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_filter_by_group_quantile_null_group_key_survives(spark):
    """quantiles_by_key keeps a NULL group key as its own group; the
    filter's join must be null-safe or the whole group vanishes."""
    from generalized_kmeans_clustering_spark.operators.stats import (
        filter_by_group_quantile,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0),
         (None, 3, 5.0), (None, 4, 9.0)],
        "k string, id long, v double")
    kept = {r["id"] for r in filter_by_group_quantile(
        df, "k", "v", q=0.5, keep="above").collect()}
    # medians (rank ceil(0.5*2)=1, the smaller value): a -> 1.0,
    # NULL-key group -> 5.0; everything is at-or-above its own
    # group's median, so ALL rows survive — including the NULL group
    assert kept == {1, 2, 3, 4}
    top = {r["id"] for r in filter_by_group_quantile(
        df, "k", "v", q=1.0, keep="above").collect()}
    assert top == {2, 4}  # group maxima only, NULL group included
