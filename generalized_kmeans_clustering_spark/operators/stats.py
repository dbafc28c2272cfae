"""Distribution audit primitives: fixed-width histograms and grouped
summary stats.

Engine extension (curation telemetry). Every filter threshold in a
curation pipeline (min_tokens, quality floor, perplexity cutoff) is
chosen by LOOKING at the distribution first; these operators produce
that look without collecting data:

- :func:`fixed_width_histogram` — engine-portable binning by exact
  integer floor division (no ``width_bucket`` semantics differences),
  one map-side-combined groupBy on the bin id. Empty bins are
  materialized (a gap in a distribution is signal, and downstream
  plotting code should not have to re-densify).
- :func:`grouped_summary` — per-group n/mean/min/max plus explicit
  Σx/Σx² so variance math is reproducible in any engine (the
  :func:`~.rollup.rolling_zscore` convention).

Both are single-aggregation plans; output is bins- or groups-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fixed_width_histogram", "grouped_summary"]


def fixed_width_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """``(bin, lo, hi, n)`` over ``n_bins`` equal-width bins spanning
    [lo, hi). Values below ``lo`` clamp into bin 0, at or above ``hi``
    into the last bin (standard edge-clamping — out-of-range mass is
    visible at the edges instead of silently dropped); NULLs are
    dropped. Bin id is ``floor((x − lo) / width)`` computed in doubles
    then clamped — identical arithmetic in any engine."""
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (float(hi) - float(lo)) / n_bins
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int")
    bin_id = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    counts = (
        df.where(x.isNotNull())
        .select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    bins = spark.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    return (
        bins.join(counts, on="bin", how="left")
        .select(
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width))
            .alias("hi"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


def grouped_summary(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group ``(group, n, mean, min, max, sum_x, sum_x2, std)``
    in one aggregation. ``std`` is the sample standard deviation
    derived from the explicit sums (engine-reproducible; NULL when
    n < 2 or the group is constant-to-rounding)."""
    x = F.col(value_col).cast("double")
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(x).alias("n"),
        F.sum(x).alias("sum_x"),
        F.sum(x * x).alias("sum_x2"),
        F.min(x).alias("min"),
        F.max(x).alias("max"),
    )
    var = (F.col("sum_x2") - F.col("sum_x") * F.col("sum_x") / F.col("n")) / (
        F.col("n") - 1
    )
    return agg.select(
        "group", "n",
        (F.col("sum_x") / F.col("n")).alias("mean"),
        "min", "max", "sum_x", "sum_x2",
        F.when((F.col("n") >= 2) & (var > 0), F.sqrt(var)).alias("std"),
    )
