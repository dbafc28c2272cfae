"""Watermarked streaming as-of join (streaming/asof.py): state-core
eviction semantics, availableNow batch parity (single and composite
key, single and multi typed payload, backward and forward), late-data
drop, tolerance expiry."""

import datetime
import os
import shutil

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.temporal import asof_join
from generalized_kmeans_clustering_spark.streaming.asof import (
    _asof_step_bwd, _asof_step_fwd, streaming_asof_join,
)

T0 = datetime.datetime(2024, 5, 1, 0, 0, 0)


def _us(sec):
    return int((T0 + datetime.timedelta(seconds=sec)).timestamp() * 1e6)


def _r(sec, v):
    return (_us(sec), 0, None, None, (v,))


def _l(sec, lid):
    return (_us(sec), 1, lid, None, (None,))


def test_asof_step_bwd_emits_and_evicts():
    # buffer: rights at 10s/20s, lefts at 15s/25s; watermark at 20s
    buf = [_l(15, 100), _r(10, 1.0), _l(25, 101), _r(20, 2.0)]
    wm_ms = _us(20) // 1000
    emits, keep, floor = _asof_step_bwd(buf, None, wm_ms, None)
    # left@15 matched right@10; left@25 immature
    assert emits == [(100, _us(15), _us(10), (1.0,))]
    # EVICTION: matured rows are gone; only the immature left remains
    assert keep == [_l(25, 101)]
    # floor = latest mature right (right@20), carried for future lefts
    assert floor == (_us(20), None, (2.0,))
    # next round: watermark passes everything -> left@25 matches floor
    emits, keep, floor = _asof_step_bwd(keep, floor, _us(30) // 1000, None)
    assert emits == [(101, _us(25), _us(20), (2.0,))]
    assert keep == [] and floor == (_us(20), None, (2.0,))


def test_asof_step_bwd_equal_ts_inclusive_and_tiebreak():
    # right at the SAME instant as left matches (inclusive backward);
    # right ties at one ts resolve by greatest tiebreak
    buf = [
        (_us(5), 1, 7, None, (None,)),
        (_us(5), 0, None, 3, (3.0,)),
        (_us(5), 0, None, 9, (9.0,)),
    ]
    emits, keep, floor = _asof_step_bwd(buf, None, _us(5) // 1000, None)
    assert emits == [(7, _us(5), _us(5), (9.0,))]
    assert keep == []


def test_asof_step_bwd_cross_batch_tie_first_arrival_wins():
    # a same-(ts, tiebreak) right folded in a LATER batch must NOT
    # displace the floor already folded (the r8 ADVICE divergence:
    # `t >= fts` let arrival order override the tie rule)
    e1, k1, floor = _asof_step_bwd(
        [(_us(5), 0, None, 1, (10.0,))], None, _us(6) // 1000, None)
    assert floor == (_us(5), 1, (10.0,))
    e2, k2, floor = _asof_step_bwd(
        [(_us(5), 0, None, 1, (99.0,))], floor, _us(8) // 1000, None)
    assert floor == (_us(5), 1, (10.0,))      # first arrival kept
    # but a strictly greater tiebreak DOES displace it
    e3, k3, floor = _asof_step_bwd(
        [(_us(5), 0, None, 2, (7.0,))], floor, _us(9) // 1000, None)
    assert floor == (_us(5), 2, (7.0,))


def test_asof_step_fwd_matches_and_boundary_retention():
    # lefts at 10s/30s; rights at 20s/40s; watermark at 20s: left@10
    # matches right@20 (least ts at-or-after), and the 20s right sits
    # IN the watermark ms -> ALSO retained for same-ms late lefts
    buf = [_l(10, 1), _r(20, 5.0), _l(30, 2), _r(40, 6.0)]
    wm = _us(20) // 1000
    emits, keep, pending = _asof_step_fwd(buf, [], wm, None)
    assert emits == [(1, _us(10), _us(20), (5.0,))]
    assert keep == [_l(30, 2), _r(40, 6.0), _r(20, 5.0)]
    assert pending == []
    # watermark passes everything: the retained right re-walks first
    # (no pending left -> no-op, not retained again), left@30 ->
    # right@40
    emits, keep, pending = _asof_step_fwd(
        keep, pending, _us(50) // 1000, None)
    assert emits == [(2, _us(30), _us(40), (6.0,))]
    assert keep == [] and pending == []


def test_asof_step_fwd_tolerance_expiry():
    # left@10 with tolerance 5s: nearest right@20 is beyond tolerance
    # -> unmatched as soon as the right is walked; left@100 with no
    # right at all expires once wm passes its deadline ms
    tol = 5_000_000
    buf = [_l(10, 1), _r(20, 5.0), _l(100, 2)]
    emits, keep, pending = _asof_step_fwd(buf, [], _us(200) // 1000, tol)
    assert sorted(emits) == [(1, _us(10), None, None),
                             (2, _us(100), None, None)]
    assert keep == [] and pending == []
    # deadline NOT yet passed -> still pending, no emit
    emits, keep, pending = _asof_step_fwd(
        [_l(100, 3)], [], _us(101) // 1000, tol)
    assert emits == [] and pending == [(_us(100), 3)]


def _write_files(spark, tmp_path, files, name, schema):
    src = str(tmp_path / f"src_{name}")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"tmp_{name}_{i}")
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.copy(os.path.join(tmp, part),
                    os.path.join(src, f"{i:02d}.parquet"))
    return spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)


def _collect_stream(spark, tmp_path, out, name):
    q = (out.writeStream.format("memory").queryName(f"asof_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return spark.sql(
        f"SELECT * FROM asof_{name} ORDER BY event_id").collect()


SCHEMA1 = ("user_id long, ts timestamp, event_id long, value double,"
           " is_left int")


def _run_stream(spark, tmp_path, files, name, **kw):
    stream = _write_files(spark, tmp_path, files, name, SCHEMA1)
    out = streaming_asof_join(
        stream.where(F.col("is_left") == 1),
        stream.where(F.col("is_left") == 0),
        "user_id", "ts", "event_id", "value", **kw)
    return _collect_stream(spark, tmp_path, out, name)


def test_streaming_asof_matches_batch(spark, tmp_path):
    # interleaved lefts/rights for 3 users, split into 2 time-ordered
    # files; parity must hold for this micro-batching
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for s in range(0, 600, 45):          # rights every 45s
            rows.append((u, T0 + datetime.timedelta(seconds=s + u), None,
                         float(u * 1000 + s), 0))
        for s in range(10, 600, 70):         # lefts every 70s
            rows.append((u, T0 + datetime.timedelta(seconds=s + 2 * u),
                         eid, None, 1))
            eid += 1
    rows.sort(key=lambda r: r[1])
    half = len(rows) // 2
    got = _run_stream(spark, tmp_path, [rows[:half], rows[half:]], "parity")

    df = spark.createDataFrame(rows, SCHEMA1)
    exp = asof_join(
        df.where("is_left = 1").select("user_id", "ts", "event_id"),
        df.where("is_left = 0").select("user_id", "ts", "value"),
        "user_id", "ts", "ts", ["value"],
    ).collect()
    exp_m = {r["event_id"]: (r["value"], r["matched_ts"]) for r in exp}
    got_m = {r["event_id"]: (r["value"], r["matched_ts"]) for r in got}
    assert got_m == exp_m
    assert len(got_m) == eid  # every left row emitted exactly once


SCHEMA2 = ("user_id long, lane int, ts timestamp, event_id long, "
           "value double, tag string, seen boolean, is_left int")


def test_streaming_asof_composite_key_multi_payload(spark, tmp_path):
    """Composite (user_id, lane) key with THREE typed payload columns
    (double, string, boolean) carried row-atomically — batch parity
    for a 2-file time split, both directions."""
    rows, eid = [], 0
    for u in (1, 2):
        for lane in (0, 1):
            for s in range(0, 500, 60):       # rights every 60s
                rows.append((u, lane, T0 + datetime.timedelta(
                    seconds=s + 3 * u + lane), None,
                    float(u * 100 + lane * 10 + s),
                    f"t{u}{lane}{s}", s % 120 == 0, 0))
            for s in range(15, 500, 85):      # lefts every 85s
                rows.append((u, lane, T0 + datetime.timedelta(
                    seconds=s + u), eid, None, None, None, 1))
                eid += 1
    rows.sort(key=lambda r: r[2])
    half = len(rows) // 2
    df = spark.createDataFrame(rows, SCHEMA2)
    for direction in ("backward", "forward"):
        stream = _write_files(spark, tmp_path, [rows[:half], rows[half:]],
                              f"multi_{direction}", SCHEMA2)
        out = streaming_asof_join(
            stream.where(F.col("is_left") == 1),
            stream.where(F.col("is_left") == 0),
            ["user_id", "lane"], "ts", "event_id",
            ["value", "tag", "seen"], direction=direction,
            tolerance_seconds=3600.0)
        got = _collect_stream(spark, tmp_path, out, f"multi_{direction}")
        exp = asof_join(
            df.where("is_left = 1").select("user_id", "lane", "ts",
                                           "event_id"),
            df.where("is_left = 0").select("user_id", "lane", "ts",
                                           "value", "tag", "seen"),
            ["user_id", "lane"], "ts", "ts", ["value", "tag", "seen"],
            direction=direction, tolerance_seconds=3600.0,
        ).collect()
        exp_m = {r["event_id"]: (r["value"], r["tag"], r["seen"],
                                 r["matched_ts"]) for r in exp}
        got_m = {r["event_id"]: (r["value"], r["tag"], r["seen"],
                                 r["matched_ts"]) for r in got}
        assert got_m == exp_m, direction
        assert len(got_m) == eid, direction


SCHEMA3 = ("user_id long, ts timestamp, event_id long, value double, "
           "obs_ts timestamp, pri int, is_left int")


def test_streaming_asof_timestamp_payload_and_tiebreak(spark, tmp_path):
    """A TIMESTAMP payload column rides the state store as unix
    micros and restores exactly; right (key, ts) ties resolve by the
    explicit tiebreak column (greatest wins backward) — batch parity
    on both."""
    t = lambda s: T0 + datetime.timedelta(seconds=s)  # noqa: E731
    rows = [
        # two rights at the SAME (user, ts): pri decides the winner
        (1, t(10), None, 1.0, t(1), 5, 0),
        (1, t(10), None, 2.0, t(2), 9, 0),
        (1, t(20), 0, None, None, None, 1),
        (1, t(40), None, 3.0, t(3), 1, 0),
        (1, t(50), 1, None, None, None, 1),
        (1, t(300), 2, None, None, None, 1),
    ]
    stream = _write_files(spark, tmp_path, [rows[:3], rows[3:]],
                          "tspay", SCHEMA3)
    out = streaming_asof_join(
        stream.where(F.col("is_left") == 1),
        stream.where(F.col("is_left") == 0),
        "user_id", "ts", "event_id", ["value", "obs_ts"],
        tiebreak_col="pri")
    got = _collect_stream(spark, tmp_path, out, "tspay")
    df = spark.createDataFrame(rows, SCHEMA3)
    exp = asof_join(
        df.where("is_left = 1").select("user_id", "ts", "event_id"),
        df.where("is_left = 0").select("user_id", "ts", "value",
                                       "obs_ts", "pri"),
        "user_id", "ts", "ts", ["value", "obs_ts"], tiebreak_col="pri",
    ).collect()
    exp_m = {r["event_id"]: (r["value"], r["obs_ts"], r["matched_ts"])
             for r in exp}
    got_m = {r["event_id"]: (r["value"], r["obs_ts"], r["matched_ts"])
             for r in got}
    assert got_m == exp_m
    # the tie at t=10 resolved to pri=9's payload, obs_ts round-tripped
    assert got_m[0] == (2.0, T0 + datetime.timedelta(seconds=2), t(10))


def test_streaming_asof_forward_without_tolerance_holds_trailing(
        spark, tmp_path):
    """Forward with NO tolerance: lefts match the next right exactly;
    a trailing left with no later right is HELD (documented — the
    stream cannot prove no right will come), not emitted unmatched."""
    rows = [
        (1, T0, 0, None, 1),
        (1, T0 + datetime.timedelta(seconds=30), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=40), 1, None, 1),  # trailing
        (1, T0 + datetime.timedelta(seconds=600), 2, None, 1),  # trailing
    ]
    got = _run_stream(spark, tmp_path, [rows], "fwd_hold",
                      direction="forward")
    m = {r["event_id"]: (r["value"], r["matched_ts"]) for r in got}
    assert m == {0: (7.0, T0 + datetime.timedelta(seconds=30))}


def test_streaming_asof_tolerance_and_unmatched(spark, tmp_path):
    rows = [
        (1, T0, None, 5.0, 0),                                   # right @0
        (1, T0 + datetime.timedelta(seconds=10), 0, None, 1),    # left @10
        (1, T0 + datetime.timedelta(seconds=500), 1, None, 1),   # left @500
        (2, T0 + datetime.timedelta(seconds=20), 2, None, 1),    # no right
        (2, T0 + datetime.timedelta(seconds=600), None, 1.0, 0),
    ]
    got = _run_stream(spark, tmp_path, [rows], "tol",
                      tolerance_seconds=60.0)
    m = {r["event_id"]: (r["value"], r["matched_ts"]) for r in got}
    assert m[0] == (5.0, T0)
    assert m[1] == (None, None)      # match older than tolerance voided
    assert m[2] == (None, None)      # never any right for user 2


def test_streaming_asof_drops_late_right(spark, tmp_path):
    """A right row arriving AFTER the watermark passed its event time
    must not rewrite history: with delay=0 the watermark after file 1
    sits at file 1's max event time, so file 2's stale right (event
    time 0s) is late and dropped — the left in file 2 still matches
    the in-order right."""
    f1 = [
        (1, T0 + datetime.timedelta(seconds=100), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=110), 0, None, 1),
    ]
    f2 = [
        (1, T0, None, 99.0, 0),                                  # LATE
        (1, T0 + datetime.timedelta(seconds=120), 1, None, 1),
    ]
    got = _run_stream(spark, tmp_path, [f1, f2], "late")
    m = {r["event_id"]: r["value"] for r in got}
    # both lefts match the legit right@100; the late 99.0 never lands
    assert m == {0: 7.0, 1: 7.0}


def test_streaming_asof_validation(spark, tmp_path):
    src = str(tmp_path / "v")
    schema = ("user_id long, ts timestamp, event_id long, value double,"
              " d date")
    spark.createDataFrame([], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="missing"):
        streaming_asof_join(stream, stream, "user_id", "ts", "nope",
                            "value")
    with pytest.raises(ValueError, match="integral"):
        streaming_asof_join(
            stream.withColumn("sid", F.lit("x")), stream,
            "user_id", "ts", "sid", "value")
    with pytest.raises(ValueError, match="supported"):
        streaming_asof_join(stream, stream, "user_id", "ts",
                            "event_id", "d")
    with pytest.raises(ValueError, match="collide"):
        streaming_asof_join(stream, stream, "user_id", "ts",
                            "event_id", ["value", "value"])
    with pytest.raises(ValueError, match="direction"):
        streaming_asof_join(stream, stream, "user_id", "ts",
                            "event_id", "value", direction="nearest")


def test_terminal_millisecond_boundary_documented_drop(spark, tmp_path):
    """Pin the documented terminal 1-ms boundary (maturity.py module
    doc): a buffered row whose maturity millisecond is exactly wm+1
    gets its timeout clamped onto its own millisecond; when the stream
    ends with the terminal watermark exactly there (the row sits in
    the stream's final watermark ms, delay=0), Spark's strict
    ``timeout < watermark`` rule never fires it and the row is
    DROPPED — the one ms where availableNow parity does not hold. Any
    later event moves the watermark past it and the flush happens.
    If a maturity change closes the boundary, flip these asserts and
    update the docstrings."""
    ms = datetime.timedelta(milliseconds=1)
    base = [
        (1, T0 + datetime.timedelta(seconds=5), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=10), 100, None, 1),
    ]
    # boundary row: exactly 1 ms above the wm that file 0 establishes,
    # and the global max event time (it becomes the terminal wm)
    edge = [(2, T0 + datetime.timedelta(seconds=10) + ms, 200, None, 1)]
    got = _run_stream(spark, tmp_path, [base, edge], "edge")
    ids = {r["event_id"] for r in got}
    assert 100 in ids          # ordinary key flushes via its timeout
    assert 200 not in ids      # the documented boundary drop

    # recovery: one later event anywhere moves the terminal watermark
    # past the boundary ms and the row flushes (unmatched: NULL match)
    later = [(1, T0 + datetime.timedelta(seconds=20), None, 9.0, 0)]
    got2 = _run_stream(spark, tmp_path, [base, edge, later], "edge2")
    m = {r["event_id"]: r["matched_ts"] for r in got2}
    assert 100 in m and 200 in m
    assert m[200] is None      # user 2 never had a right


# --- terminal flush (asof_replay_flush) --------------------------------------

def _flush_parity(spark, tmp_path, files, name, **kw):
    """Run the availableNow replay, then asof_replay_flush over the
    same bounded data; return (streamed, flushed, batch) row dicts and
    assert the contract: streamed ∪ flushed == batch, disjointly."""
    from generalized_kmeans_clustering_spark.streaming.asof import (
        asof_replay_flush,
    )

    _run_stream(spark, tmp_path, files, name, **kw)
    streamed = spark.sql(f"SELECT * FROM asof_{name}")
    all_rows = [r for f in files for r in f]
    df = spark.createDataFrame(all_rows, SCHEMA1)
    left = df.where(F.col("is_left") == 1).select("user_id", "ts", "event_id")
    right = df.where(F.col("is_left") == 0).select("user_id", "ts", "value")
    flushed = asof_replay_flush(
        left, right, streamed, "user_id", "ts", "event_id", "value", **kw)
    batch = asof_join(left, right, "user_id", "ts", "ts", ["value"], **kw)

    def keyed(frame):
        return {r["event_id"]: (r["value"], r["matched_ts"])
                for r in frame.collect()}

    s, fl, b = keyed(streamed), keyed(flushed), keyed(batch)
    assert set(s) | set(fl) == set(b)
    assert not set(s) & set(fl)            # disjoint
    assert {**s, **fl} == b                # value-exact union
    return s, fl, b


def test_asof_replay_flush_forward_no_tolerance(spark, tmp_path):
    """The held-trailing-left case from the module docstring: forward
    with no tolerance holds every trailing unmatched left; the flush
    returns exactly those, NULL payload, and the union is batch."""
    rows = [
        (1, T0, 0, None, 1),
        (1, T0 + datetime.timedelta(seconds=30), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=40), 1, None, 1),
        (1, T0 + datetime.timedelta(seconds=600), 2, None, 1),
    ]
    s, fl, _ = _flush_parity(spark, tmp_path, [rows], "flush_nt",
                             direction="forward")
    assert set(s) == {0} and set(fl) == {1, 2}
    assert fl[1] == (None, None) and fl[2] == (None, None)


def test_asof_replay_flush_forward_final_tolerance_window(spark, tmp_path):
    """With a tolerance, only unmatched lefts whose deadline reaches
    the terminal watermark are held: the early unmatched left streams
    out; the one inside the final tolerance window flushes here."""
    rows = [
        (1, T0, 0, None, 1),                                   # no right
        (1, T0 + datetime.timedelta(seconds=500), None, 3.0, 0),
        (1, T0 + datetime.timedelta(seconds=520), 1, None, 1),  # > right: unmatched
        (1, T0 + datetime.timedelta(seconds=590), 2, None, 1),  # held
    ]
    s, fl, _ = _flush_parity(spark, tmp_path, [rows], "flush_tol",
                             direction="forward", tolerance_seconds=60.0)
    assert set(s) == {0, 1}
    assert s[0] == (None, None)            # deadline passed -> streamed
    assert s[1] == (None, None)            # no right AFTER 520s either
    assert set(fl) == {2} and fl[2] == (None, None)


def test_asof_replay_flush_recovers_terminal_ms_boundary(spark, tmp_path):
    """The maturity.py terminal-millisecond drop: a left in the
    stream's final watermark ms is held by Spark's strict
    timeout < watermark rule — backward direction, so batch gives it
    a REAL match, and the flush recovers it with that match (not just
    NULL): the replay path now has no parity caveat at all."""
    ms = datetime.timedelta(milliseconds=1)
    base = [
        (1, T0 + datetime.timedelta(seconds=5), None, 7.0, 0),
        (1, T0 + datetime.timedelta(seconds=10), 100, None, 1),
    ]
    edge = [(1, T0 + datetime.timedelta(seconds=10) + ms, 200, None, 1)]
    s, fl, _ = _flush_parity(spark, tmp_path, [base, edge], "flush_edge",
                             direction="backward")
    assert 100 in s
    assert set(fl) == {200}
    assert fl[200] == (7.0, T0 + datetime.timedelta(seconds=5))


def test_asof_replay_flush_composite_key_multi_payload(spark, tmp_path):
    """Flush parity at the full contract: composite (user_id, lane)
    key, three typed payloads, forward with no tolerance — each key's
    trailing left is held by the stream and recovered by the flush
    with NULL payloads; union equals batch exactly."""
    from generalized_kmeans_clustering_spark.streaming.asof import (
        asof_replay_flush,
    )

    rows, eid = [], 0
    for u in (1, 2):
        for lane in (0, 1):
            rows.append((u, lane, T0 + datetime.timedelta(seconds=10 + u),
                         eid, None, None, None, 1))
            rows.append((u, lane, T0 + datetime.timedelta(seconds=40 + u),
                         None, float(u * 10 + lane), f"t{u}{lane}",
                         lane == 0, 0))
            # trailing left: no later right on this key
            rows.append((u, lane, T0 + datetime.timedelta(seconds=90 + u),
                         eid + 1, None, None, None, 1))
            eid += 2
    rows.sort(key=lambda r: r[2])
    stream = _write_files(spark, tmp_path, [rows], "flush_ck", SCHEMA2)
    out = streaming_asof_join(
        stream.where(F.col("is_left") == 1),
        stream.where(F.col("is_left") == 0),
        ["user_id", "lane"], "ts", "event_id",
        ["value", "tag", "seen"], direction="forward")
    _collect_stream(spark, tmp_path, out, "flush_ck")
    streamed = spark.sql("SELECT * FROM asof_flush_ck")
    df = spark.createDataFrame(rows, SCHEMA2)
    left = df.where("is_left = 1").select("user_id", "lane", "ts",
                                          "event_id")
    right = df.where("is_left = 0").select("user_id", "lane", "ts",
                                           "value", "tag", "seen")
    flushed = asof_replay_flush(
        left, right, streamed, ["user_id", "lane"], "ts", "event_id",
        ["value", "tag", "seen"], direction="forward")
    batch = asof_join(left, right, ["user_id", "lane"], "ts", "ts",
                      ["value", "tag", "seen"], direction="forward")

    def keyed(frame):
        return {r["event_id"]: (r["value"], r["tag"], r["seen"],
                                r["matched_ts"]) for r in frame.collect()}

    s, fl, b = keyed(streamed), keyed(flushed), keyed(batch)
    assert set(fl) == {1, 3, 5, 7}          # the 4 trailing lefts
    assert all(v == (None, None, None, None) for v in fl.values())
    assert not set(s) & set(fl)
    assert {**s, **fl} == b


def test_asof_replay_flush_null_key_no_duplicates(spark, tmp_path):
    """A NULL key groups like any value in both the state op and the
    batch window; the flush's anti-join must be null-SAFE so a
    streamed NULL-key row is not re-emitted as a duplicate, while the
    NULL-key trailing left is still recovered."""
    from generalized_kmeans_clustering_spark.streaming.asof import (
        asof_replay_flush,
    )

    rows = [
        (None, T0, 0, None, 1),
        (None, T0 + datetime.timedelta(seconds=30), None, 7.0, 0),
        (None, T0 + datetime.timedelta(seconds=50), 1, None, 1),  # trails
        (1, T0, 2, None, 1),
        (1, T0 + datetime.timedelta(seconds=60), None, 3.0, 0),
    ]
    _run_stream(spark, tmp_path, [rows], "flush_nullkey",
                direction="forward")
    streamed = spark.sql("SELECT * FROM asof_flush_nullkey")
    df = spark.createDataFrame(rows, SCHEMA1)
    left = df.where("is_left = 1").select("user_id", "ts", "event_id")
    right = df.where("is_left = 0").select("user_id", "ts", "value")
    flushed = asof_replay_flush(left, right, streamed, "user_id", "ts",
                                "event_id", "value", direction="forward")
    s = {r["event_id"] for r in streamed.collect()}
    fl = {r["event_id"]: (r["value"], r["matched_ts"])
          for r in flushed.collect()}
    assert s == {0, 2}                      # both matched lefts streamed
    assert set(fl) == {1}                   # ONLY the trailing left
    assert fl[1] == (None, None)
