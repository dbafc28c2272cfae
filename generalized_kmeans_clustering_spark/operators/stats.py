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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["filter_by_group_quantile", "fixed_width_histogram",
           "grouped_summary", "quantiles_by_key"]


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
    visible at the edges instead of silently dropped); NULLs and NaN
    are dropped (NaN would otherwise floor-cast to 0 and silently pad
    bin 0 — same convention as :func:`quantiles_by_key`). Bin id is
    ``floor((x − lo) / width)`` computed in doubles then clamped —
    identical arithmetic in any engine."""
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    if not hi > lo:
        raise ValueError("need hi > lo")
    width = (float(hi) - float(lo)) / n_bins
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int")
    bin_id = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    counts = (
        df.where(x.isNotNull() & ~F.isnan(x))
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


def _q_label(q: float) -> str:
    """Quantile → output-column label (``q_<label>``), percent-based:
    0.25 → ``25``, 0.5 → ``50``, 1.0 → ``100``, 0.125 → ``12_5``.
    The ONE label formula shared by :func:`quantiles_by_key` (which
    writes ``q_<label>`` columns) and
    :func:`filter_by_group_quantile` (which reads one back) — a
    single source of truth so the reader can never drift from the
    writer."""
    return ("%g" % (q * 100)).replace(".", "_")


def _present_mask(df: DataFrame, value_col: str):
    """NULL (and, for float columns, NaN — Spark sorts NaN above every
    number) exclusion predicate: the ONE population rule shared by
    :func:`quantiles_by_key` and :func:`filter_by_group_quantile`, so
    a threshold and the rows filtered against it always come from the
    same value population."""
    x = F.col(value_col)
    present = x.isNotNull()
    if dict(df.dtypes)[value_col] in ("float", "double"):
        present = present & ~F.isnan(x)
    return present


def quantiles_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs=(0.25, 0.5, 0.75, 0.9, 0.99),
    method: str = "exact",
    auto_distinct_threshold: int = 1_000_000,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """EXACT discrete per-key quantiles — the value at 1-based rank
    ``ceil(q * n)`` in each key's sorted values (``quantile_disc``
    semantics: an actual data value, never an interpolation, so the
    result is engine- and float-order-invariant). NULL values — and
    NaN, for float columns: Spark sorts NaN above every number, so one
    NaN would otherwise capture the top quantiles — are dropped; a key
    whose values are all missing does not appear.

    Output: ``(key, n, q_<label>...)`` with one column per requested
    quantile (label = q as a percent: ``q_25``, ``q_50``, ``q_99``,
    ``q_100``; fractional percents use ``_`` for the point).

    Distributed shape (exact path): groupBy (key, value) collapses
    duplicates FIRST — the window that ranks values then runs over the
    distinct values per key, not the rows, so hot keys with few
    distinct values (the common skew: a spam string, an empty doc)
    cost one row per distinct value. Two key-shuffles total (pre-agg +
    window; the final per-key agg reuses the window's partitioning).
    No sort of the raw table, no collect.

    Cost ceiling and routing (``method``): the exact path's unit of
    work is DISTINCT VALUES per key — a continuous double column with
    hundreds of millions of distinct values per key makes the per-key
    window sort the bottleneck. Routing mirrors the assignment layer's
    k·d decision tree:

    - ``"exact"`` (default) — always the window path above.
    - ``"approx"`` — one ``percentile_approx`` aggregation (Greenwald–
      Khanna sketch, map-side combined, NO per-key sort; error bound
      ``1/approx_accuracy`` of rank). Still returns actual data
      values, but the rank is approximate — not oracle-comparable.
    - ``"auto"`` — one cheap probe aggregation (max APPROXIMATE
      distinct values per key via ``approx_count_distinct`` — an HLL
      sketch, map-side combined, so the probe never shuffles the
      (key, value) pairs it exists to avoid shuffling; one extra
      Spark job, documented) routes to exact below
      ``auto_distinct_threshold`` distinct values per key, approx at
      or above it. The HLL's ~5% relative error (Spark's default
      rsd=0.05) is immaterial to an order-of-magnitude routing
      threshold.
    """
    if not qs:
        raise ValueError("quantiles_by_key: need at least one q")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles_by_key: q={q} outside (0, 1]")
    if method not in ("exact", "approx", "auto"):
        raise ValueError(
            f"quantiles_by_key: method={method!r} not in exact/approx/auto")
    # percent-based labels — unambiguous where fraction-digit labels
    # collide (0.1 and 1.0 both gave "1"); formula shared with the
    # reader in filter_by_group_quantile via _q_label
    labels = [_q_label(q) for q in qs]
    if len(set(labels)) != len(labels):
        raise ValueError("quantiles_by_key: duplicate q labels")
    x = F.col(value_col)
    present = _present_mask(df, value_col)
    if method == "auto":
        # approx_count_distinct, NOT count_distinct: an exact count-
        # distinct at the ~1e8-distinct scale the probe exists to
        # detect is itself a full (key, value) shuffle — roughly the
        # cost of the exact path it is trying to avoid
        probe = (
            df.where(present)
            .groupBy(F.col(key_col).alias("key"))
            .agg(F.approx_count_distinct(x).alias("nd"))
            .agg(F.max("nd").alias("max_nd"))
            .first()
        )
        max_nd = 0 if probe is None or probe["max_nd"] is None else int(
            probe["max_nd"])
        method = "exact" if max_nd < auto_distinct_threshold else "approx"
    if method == "approx":
        agg_exprs = [F.count(F.lit(1)).alias("n")]
        for q, lab in zip(qs, labels):
            agg_exprs.append(
                F.percentile_approx(x, F.lit(float(q)),
                                    F.lit(int(approx_accuracy)))
                .alias(f"q_{lab}"))
        return (
            df.where(present)
            .groupBy(F.col(key_col).alias("key"))
            .agg(*agg_exprs)
        )
    counts = (
        df.where(present)
        .groupBy(F.col(key_col).alias("key"), x.alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wk = Window.partitionBy("key")
    wcum = wk.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                       Window.currentRow)
    ranked = counts.select(
        "key", "v", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wk).alias("n"),
    )
    # rank target r = ceil(q*n); the row CONTAINING rank r satisfies
    # cum - c < r <= cum — min() just collapses the one hit per (key,q).
    # Snap the product to 9dp BEFORE ceil: q*n in binary floats can land
    # just above the exact integer (0.07*100 = 7.000000000000001 ->
    # ceil 8, one rank too high), and a rank shifted by one returns the
    # wrong quantile VALUE with no error.
    sel = []
    for q, lab in zip(qs, labels):
        r = F.ceil(F.round(F.lit(float(q)) * F.col("n"), 9))
        hit = (F.col("cum") >= r) & ((F.col("cum") - F.col("c")) < r)
        sel.append(F.min(F.when(hit, F.col("v"))).alias(f"q_{lab}"))
    out = ranked.groupBy("key").agg(
        F.max("n").alias("n"), *sel)
    return out


def filter_by_group_quantile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q: float = 0.5,
    keep: str = "above",
    method: str = "exact",
    auto_distinct_threshold: int = 1_000_000,
    approx_accuracy: int = 10_000,
) -> DataFrame:
    """Adaptive PER-GROUP threshold filter: keep each group's rows at
    or ``keep``-side of the group's own q-quantile of ``value_col``.

    The curation use: one GLOBAL quality cutoff deletes entire domains
    whose score distribution sits low (non-English sources under an
    English-trained scorer, code under a prose scorer); "keep each
    source's best (1−q) share" adapts the cutoff per group instead.
    ``keep="above"`` keeps ``value >= quantile`` (quality scores);
    ``keep="below"`` keeps ``value <= quantile`` (perplexity — lower
    is better). The comparison is inclusive of the quantile value
    itself on both sides, so with ``quantile_disc`` semantics (an
    actual data value) every group keeps at least one row. Rows whose
    value is NULL/NaN are dropped, matching
    :func:`quantiles_by_key`'s population.

    At 100 TB: the thresholds frame is ONE ROW PER GROUP — it rides a
    broadcast hash join back onto the corpus, so the filter itself
    adds no shuffle; total cost is :func:`quantiles_by_key`'s
    (``method`` routes exact / approx / auto exactly as there —
    ``"approx"`` is one map-side-combined sketch aggregation and the
    right default when groups have ~10⁸ distinct values).
    """
    if keep not in ("above", "below"):
        raise ValueError(f"keep: 'above' | 'below', got {keep!r}")
    thresholds = quantiles_by_key(
        df, key_col, value_col, qs=(q,), method=method,
        auto_distinct_threshold=auto_distinct_threshold,
        approx_accuracy=approx_accuracy,
    )
    thr = thresholds.select(
        F.col("key").alias("_thr_key"),
        F.col(f"q_{_q_label(q)}").alias("_thr"))
    x = F.col(value_col)
    cond = x >= F.col("_thr") if keep == "above" else x <= F.col("_thr")
    # eqNullSafe, not equi-join on the name: quantiles_by_key keeps a
    # NULL group key as its own group, and a plain inner join would
    # silently delete that whole group (NULL never equals NULL)
    return (
        df.where(_present_mask(df, value_col))
        .join(F.broadcast(thr),
              F.col(key_col).eqNullSafe(F.col("_thr_key")), "inner")
        .where(cond)
        .drop("_thr_key", "_thr")
    )
