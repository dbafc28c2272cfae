"""Property tests for the native temporal twins' BATCH semantics:
session_rollup and throttle_events vs independent pure-Python
references over random event sets. The streaming twins are native
Spark plans with no extractable Python core (unlike asof/funnel/
retention, whose cores test_streaming_property.py drives), so the
decisive semantics — the session merge boundary (delta == gap MERGES;
the r11 find that the SQL twin had it backwards) and the throttle's
epoch-aligned keep rule — are pinned here against a reference that
shares no code with the plan, for ANY event set."""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from generalized_kmeans_clustering_spark.operators.rollup import (
    session_rollup, throttle_events,
)

SETTINGS = dict(max_examples=8, deadline=None, derandomize=True)
T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)

# seconds offsets that exercise the exact gap boundary (gap=60s):
# deltas of 59/60/61 all occur
EVENTS = st.lists(
    st.tuples(st.integers(1, 3),                    # user
              st.integers(0, 300)),                 # seconds offset
    min_size=1, max_size=40)


def _ref_sessions(rows, gap_s=60):
    """Pure-Python reference: per user, sort times, extend while
    delta <= gap (boundary-inclusive), emit (user, start, last + gap,
    count). Duplicates count as events."""
    out = []
    by_user = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    for u, ts in by_user.items():
        ts.sort()
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last <= gap_s:
                last, n = t, n + 1
            else:
                out.append((u, start, last + gap_s, n))
                start, last, n = t, t, 1
        out.append((u, start, last + gap_s, n))
    return sorted(out)


def _ref_throttle(rows, w_s=60):
    """Pure-Python reference: earliest (ts, event_id) per (user,
    epoch-aligned bucket); returns kept event ids."""
    best = {}
    for eid, (u, s) in enumerate(rows):
        k = (u, s // w_s)
        if k not in best or (s, eid) < best[k]:
            best[k] = (s, eid)
    return sorted(eid for _, eid in best.values())


@given(rows=EVENTS)
@settings(**SETTINGS)
def test_session_rollup_matches_pure_reference(spark_global, rows):
    spark = spark_global
    df = spark.createDataFrame(
        [(u, T0 + datetime.timedelta(seconds=s)) for u, s in rows],
        "user_id long, ts timestamp")
    got = sorted(
        (r["user_id"],
         int((r["session_start"] - T0).total_seconds()),
         int((r["session_end"] - T0).total_seconds()),
         r["n_events"])
        for r in session_rollup(df, gap_minutes=1.0).collect())
    assert got == _ref_sessions(rows)


@given(rows=EVENTS)
@settings(**SETTINGS)
def test_throttle_events_matches_pure_reference(spark_global, rows):
    spark = spark_global
    df = spark.createDataFrame(
        [(eid, u, "e", T0 + datetime.timedelta(seconds=s))
         for eid, (u, s) in enumerate(rows)],
        "event_id long, user_id long, event_type string, ts timestamp")
    kept = sorted(
        r["event_id"]
        for r in throttle_events(df, ("user_id", "event_type"), "ts",
                                 60.0, "event_id").collect())
    assert kept == _ref_throttle(rows)
