"""Center-update operators: per-cluster weighted aggregation.

Re-expression of the reference's update layer
(``strategies/UpdateStrategy.scala:38-253``). The reference hand-rolls
partial/final combine with ``rdd.aggregateByKey`` + ``collectAsMap``;
in Spark SQL a ``groupBy().agg()`` already does map-side partial
aggregation, so the whole update is one declarative job.

Key design: ONE aggregation job per Lloyd iteration computes
  - per-cluster weight sum + row count,
  - per-cluster per-dimension weighted gradient sums (d separate ``sum``
    aggregates over ``element_at(grad, i)`` — stays in codegen, k·d
    result rows never exceed driver scale),
  - the iteration's total distortion (sum of w·dist) — folding the
    convergence metric into the same pass removes the reference's extra
    ``count()`` materialization per iteration
    (``LloydsIterator.scala:151-153``, anti-pattern §4 of SURVEY.md).

For very wide vectors (d > ``WIDE_DIM_LIMIT``) the per-dim-aggregate
column list gets unwieldy; we fall back to a grouped-map pandas
aggregation (Arrow, one pass, partial sums per partition first).

Scale note (100 TB): output is k rows (k·d doubles) regardless of input
size; the shuffle moves only num_partitions × k pre-aggregated rows.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel

__all__ = ["cluster_stats", "centers_from_stats", "median_centers",
           "weighted_median_centers"]

WIDE_DIM_LIMIT = 256


def cluster_stats(
    assigned: DataFrame,
    kernel: Kernel,
    d: int,
    features_col: str,
    weight_col: str | None,
    cluster_col: str = "_cluster",
    dist_col: str = "_dist",
    ncomp_col: str | None = None,
    changes_col: str | None = None,
) -> list:
    """One-pass per-cluster stats. Returns driver rows:
    (cluster, w: Σweight, n: count, cost: Σ w·dist, g: [Σ w·grad_i]).

    ``ncomp_col`` (pruned assignment only) folds the per-row
    distance-computation count into the same pass as an extra ``sum``
    — pruning telemetry costs no extra job. ``changes_col`` (0/1
    assignment-changed flag, opt-in change tracking) folds the same
    way.
    """
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    grad = kernel.grad(F.col(features_col))
    if d <= WIDE_DIM_LIMIT:
        aggs = [
            F.sum(w).alias("w"),
            F.count(F.lit(1)).alias("n"),
            F.sum(w * F.col(dist_col)).alias("cost"),
        ] + [
            F.sum(w * F.element_at(grad, i + 1)).alias(f"g{i}") for i in range(d)
        ]
        if ncomp_col:
            aggs.append(F.sum(ncomp_col).alias("ncomp"))
        if changes_col:
            aggs.append(F.sum(changes_col).alias("chg"))
        rows = assigned.groupBy(cluster_col).agg(*aggs).collect()
        return [
            {
                "cluster": r[cluster_col],
                "w": r["w"],
                "n": r["n"],
                "cost": r["cost"],
                "g": np.array([r[f"g{i}"] for i in range(d)]),
                **({"ncomp": r["ncomp"]} if ncomp_col else {}),
                **({"chg": r["chg"]} if changes_col else {}),
            }
            for r in rows
        ]
    # wide-vector path: grouped-map pandas aggregation
    import pandas as pd

    tmp = assigned.select(
        F.col(cluster_col).alias("c"),
        w.alias("wt"),
        F.col(dist_col).alias("dist"),
        grad.alias("grad"),
        *([F.col(ncomp_col).alias("ncomp")] if ncomp_col else []),
        *([F.col(changes_col).alias("chg")] if changes_col else []),
    )

    def _agg(pdf: pd.DataFrame) -> pd.DataFrame:
        G = np.asarray(pdf["grad"].tolist(), dtype=np.float64)
        wt = pdf["wt"].to_numpy()
        out = {
            "c": [int(pdf["c"].iloc[0])],
            "w": [float(wt.sum())],
            "n": [int(len(pdf))],
            "cost": [float((wt * pdf["dist"].to_numpy()).sum())],
            "g": [(G * wt[:, None]).sum(axis=0).tolist()],
        }
        out["ncomp"] = [int(pdf["ncomp"].sum())] if "ncomp" in pdf else [0]
        out["chg"] = [int(pdf["chg"].sum())] if "chg" in pdf else [0]
        return pd.DataFrame(out)

    out = tmp.groupBy("c").applyInPandas(
        _agg, "c int, w double, n long, cost double, g array<double>, "
        "ncomp long, chg long"
    ).collect()
    return [
        {"cluster": r["c"], "w": r["w"], "n": r["n"], "cost": r["cost"],
         "g": np.array(r["g"]),
         **({"ncomp": r["ncomp"]} if ncomp_col else {}),
         **({"chg": r["chg"]} if changes_col else {})}
        for r in out
    ]


def centers_from_stats(
    stats: list, kernel: Kernel, k: int, old_centers: Sequence[Sequence[float]]
) -> tuple[np.ndarray, float, list[int], list[int]]:
    """Bregman centroid per cluster: inv_grad(Σw·grad / Σw).

    Returns (new_centers k×d, total_cost, sizes, empty_cluster_ids).
    Empty clusters keep their old center here; the empty-cluster
    strategy in the Lloyd plan decides what to do with them.
    """
    old = np.asarray(old_centers, dtype=np.float64)
    new = old.copy()
    sizes = [0] * k
    cost = 0.0
    seen = set()
    for s in stats:
        c = int(s["cluster"])
        seen.add(c)
        sizes[c] = int(s["n"])
        cost += float(s["cost"])
        if s["w"] > 0:
            new[c] = kernel.finalize_center(s["g"] / s["w"])
    empty = [c for c in range(k) if c not in seen or sizes[c] == 0]
    return new, cost, sizes, empty


def median_centers(
    assigned: DataFrame,
    d: int,
    k: int,
    features_col: str,
    weight_col: str | None,
    cluster_col: str = "_cluster",
    dist_col: str = "_dist",
    old_centers: Sequence[Sequence[float]] = (),
    accuracy: int = 10_000,
) -> tuple[np.ndarray, float, list[int], list[int]]:
    """K-Medians update: per-cluster per-dimension median via
    ``percentile_approx`` — distributed, unlike the reference's
    per-dimension driver collect (``UpdateStrategy.scala:203-224``,
    anti-pattern §4.2 of SURVEY.md). With a weight column the exact
    weighted-median path (:func:`weighted_median_centers`) is used
    instead.
    """
    if weight_col:
        return weighted_median_centers(
            assigned, d, k, features_col, weight_col,
            cluster_col=cluster_col, dist_col=dist_col,
            old_centers=old_centers,
        )
    w = F.lit(1.0)
    aggs = [
        F.sum(w).alias("w"),
        F.count(F.lit(1)).alias("n"),
        F.sum(w * F.col(dist_col)).alias("cost"),
    ] + [
        F.percentile_approx(
            F.element_at(F.col(features_col), i + 1), 0.5, accuracy
        ).alias(f"m{i}")
        for i in range(d)
    ]
    rows = assigned.groupBy(cluster_col).agg(*aggs).collect()
    old = np.asarray(old_centers, dtype=np.float64)
    new = old.copy()
    sizes = [0] * k
    cost = 0.0
    seen = set()
    for r in rows:
        c = int(r[cluster_col])
        seen.add(c)
        sizes[c] = int(r["n"])
        cost += float(r["cost"])
        if r["n"] > 0:
            new[c] = np.array([r[f"m{i}"] for i in range(d)])
    empty = [c for c in range(k) if c not in seen or sizes[c] == 0]
    return new, cost, sizes, empty


def weighted_median_centers(
    assigned: DataFrame,
    d: int,
    k: int,
    features_col: str,
    weight_col: str,
    cluster_col: str = "_cluster",
    dist_col: str = "_dist",
    old_centers: Sequence[Sequence[float]] = (),
) -> tuple[np.ndarray, float, list[int], list[int]]:
    """EXACT distributed weighted median per (cluster, dimension).

    Explode to (cluster, dim, value, weight) cells, shuffle once on
    (cluster, dim), and pick the first value whose running weight
    reaches half the total via a cumulative-sum window — the classic
    lower weighted median. Shuffle volume is n·d cells; result is k·d
    rows. This replaces the reference's per-dimension driver collect
    (``UpdateStrategy.scala:203-224``).
    """
    from pyspark.sql.window import Window

    w = F.col(weight_col)
    cells = assigned.select(
        F.col(cluster_col).alias("_c"),
        w.alias("_w"),
        F.posexplode(F.col(features_col)).alias("_dim", "_v"),
    )
    win = (
        Window.partitionBy("_c", "_dim").orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("_c", "_dim")
    scored = cells.withColumn("_cum", F.sum("_w").over(win)).withColumn(
        "_tot", F.sum("_w").over(tot)
    )
    med = (
        scored.where(F.col("_cum") >= F.col("_tot") / 2.0)
        .groupBy("_c", "_dim").agg(F.min("_v").alias("_med"))
        .collect()
    )
    stats = assigned.groupBy(cluster_col).agg(
        F.sum(w).alias("w"),
        F.count(F.lit(1)).alias("n"),
        F.sum(w * F.col(dist_col)).alias("cost"),
    ).collect()
    old = np.asarray(old_centers, dtype=np.float64)
    new = old.copy()
    sizes = [0] * k
    cost = 0.0
    seen = set()
    for r in stats:
        c = int(r[cluster_col])
        seen.add(c)
        sizes[c] = int(r["n"])
        cost += float(r["cost"])
    for r in med:
        c = int(r["_c"])
        if sizes[c] > 0:
            new[c, int(r["_dim"])] = float(r["_med"])
    empty = [c for c in range(k) if c not in seen or sizes[c] == 0]
    return new, cost, sizes, empty
