"""normalize_text / cap_per_group / rolling_zscore unit semantics."""

import datetime

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions.text import (
    normalize_text,
    normalized_fingerprint,
)
from generalized_kmeans_clustering_spark.operators.rollup import (
    rolling_zscore,
)
from generalized_kmeans_clustering_spark.operators.sampling import (
    cap_per_group,
)


def test_normalize_text_variants_converge(spark):
    rows = [
        (0, "Hello,   World!"),
        (1, "hello world"),
        (2, "HELLO WORLD!!!"),
        (3, "  hello\tworld  "),
        (4, "goodbye world"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        normalize_text(F.col("text")).alias("norm"),
        normalized_fingerprint(F.col("text")).alias("fp"),
    ).collect()
    norms = {r["doc_id"]: r["norm"] for r in out}
    fps = {r["doc_id"]: r["fp"] for r in out}
    assert norms[0] == norms[1] == norms[2] == norms[3] == "hello world"
    assert fps[0] == fps[1] == fps[2] == fps[3]
    assert fps[4] != fps[0]


def test_cap_per_group_deterministic_and_nested(spark):
    rows = [(i, f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    small = cap_per_group(df, 2, seed=1)
    big = cap_per_group(df, 5, seed=1)
    s_ids = {r["doc_id"] for r in small.collect()}
    b_ids = {r["doc_id"] for r in big.collect()}
    assert s_ids <= b_ids  # same-seed caps nest
    # per-group counts honor the cap
    counts = {r["source"]: r["n"] for r in
              small.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(v == 2 for v in counts.values())
    # repartitioning does not change survivors
    again = {r["doc_id"]
             for r in cap_per_group(df.repartition(7), 2, seed=1).collect()}
    assert again == s_ids


def test_cap_per_group_order_cols(spark):
    rows = [(1, "s", 0.9), (2, "s", 0.1), (3, "s", 0.5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    kept = {r["doc_id"] for r in cap_per_group(
        df, 2, order_cols=[F.desc("q"), F.asc("doc_id")]).collect()}
    assert kept == {1, 3}  # best-quality rows survive


def test_cap_validation(spark):
    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    with pytest.raises(ValueError):
        cap_per_group(df, 0)


def _mkevents(spark, values, etype="t"):
    base = datetime.datetime(2026, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), etype, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_rolling_zscore_flags_spike(spark):
    vals = [1.0, 1.1, 0.9, 1.0, 1.05, 0.95, 1.0, 1.1, 0.9, 1.0,
            1.02, 50.0, 1.0]
    df = _mkevents(spark, vals)
    out = {r["event_id"]: r for r in rolling_zscore(
        df, lookback=10, min_history=5, threshold=3.0).collect()}
    assert out[11]["is_anomaly"]           # the spike
    assert not out[12]["is_anomaly"]       # back to normal
    # warm-up rows have NULL z and are never anomalies
    assert out[2]["zscore"] is None and not out[2]["is_anomaly"]
    # current row excluded from its own baseline: spike z is huge
    assert out[11]["zscore"] > 10


def test_rolling_zscore_constant_history_null(spark):
    df = _mkevents(spark, [2.0] * 8)
    out = rolling_zscore(df, lookback=5, min_history=2).collect()
    assert all(r["zscore"] is None for r in out)  # zero std -> NULL
    assert not any(r["is_anomaly"] for r in out)


def test_rolling_zscore_partitions_independent(spark):
    a = _mkevents(spark, [1.0, 1.1] * 5 + [100.0], etype="a")
    b = _mkevents(spark, [100.0, 101.0] * 5 + [100.0], etype="b")
    df = a.unionByName(b)
    out = rolling_zscore(df, lookback=10, min_history=5).collect()
    flags = {(r["event_type"], r["event_id"]): r["is_anomaly"] for r in out}
    assert flags[("a", 10)]       # 100 is a spike for type a...
    assert not flags[("b", 10)]   # ...and baseline for type b


def test_rolling_zscore_validation(spark):
    df = _mkevents(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        rolling_zscore(df, lookback=0)
    with pytest.raises(ValueError):
        rolling_zscore(df, min_history=1)


# --------------------------------------------------------------------------
# stats.py: histograms and grouped summaries
# --------------------------------------------------------------------------

def test_histogram_bins_and_clamping(spark):
    from generalized_kmeans_clustering_spark.operators.stats import (
        fixed_width_histogram,
    )

    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 1.0, 5.0, 9.9, 10.0, 25.0, None]],
        "x double",
    )
    out = {r["bin"]: r for r in
           fixed_width_histogram(df, "x", 0.0, 10.0, 5).collect()}
    assert len(out) == 5                       # empty bins materialized
    assert out[0]["n"] == 3                    # -5 clamps in, 0.0, 1.0
    assert out[4]["n"] == 3                    # 9.9 + clamped 10.0, 25.0
    assert out[1]["n"] == 0 and out[3]["n"] == 0
    assert out[2]["n"] == 1                    # 5.0
    assert out[0]["lo"] == 0.0 and out[0]["hi"] == 2.0
    assert sum(r["n"] for r in out.values()) == 7  # NULL dropped


def test_histogram_validation(spark):
    import pytest as _pt

    from generalized_kmeans_clustering_spark.operators.stats import (
        fixed_width_histogram,
    )

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pt.raises(ValueError):
        fixed_width_histogram(df, "x", 0, 10, 0)
    with _pt.raises(ValueError):
        fixed_width_histogram(df, "x", 10, 10, 4)


def test_grouped_summary(spark):
    import math

    from generalized_kmeans_clustering_spark.operators.stats import (
        grouped_summary,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", 5.0), ("b", 7.0), ("c", 2.0),
         ("c", 2.0)],
        "g string, x double",
    )
    out = {r["group"]: r for r in grouped_summary(df, "x", "g").collect()}
    assert out["a"]["n"] == 3 and out["a"]["mean"] == 3.0
    assert out["a"]["std"] == pytest.approx(2.0)
    assert out["b"]["std"] is None          # n < 2
    assert out["c"]["std"] is None          # constant group
    assert out["a"]["min"] == 1.0 and out["a"]["max"] == 5.0
    assert math.isclose(out["a"]["sum_x2"], 35.0)


def test_histogram_drops_nan(spark):
    from generalized_kmeans_clustering_spark.operators.stats import (
        fixed_width_histogram,
    )

    df = spark.createDataFrame(
        [(v,) for v in [1.0, float("nan"), float("nan"), 9.0, None]],
        "x double",
    )
    out = {r["bin"]: r["n"] for r in
           fixed_width_histogram(df, "x", 0.0, 10.0, 5).collect()}
    # NaN must NOT be counted in bin 0 (floor(NaN) casts to 0 there)
    assert out == {0: 1, 1: 0, 2: 0, 3: 0, 4: 1}
