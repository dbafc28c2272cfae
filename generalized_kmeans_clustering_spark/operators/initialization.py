"""Center initialization: deterministic random init and true k-means||.

The reference's "k-means||" collects ALL points to the driver and runs
serial k-means++ (``df/CenterInitializer.scala:145-231``, collect at
:156 — SURVEY.md §4 anti-pattern #1). This module implements the real
distributed Bahmani k-means|| so initialization scales with the data:

  1. pick 1 seed center (seed-stable hash order),
  2. ``init_steps`` rounds: each point joins the candidate set with
     probability min(1, l · d²(x, C) / Σ d²) — evaluated executor-side
     with a seed-stable ``rand``; candidates are collected (≤ k·l·steps
     rows, driver-safe),
  3. weight each candidate by the number of points it covers (one
     assignment aggregation), and run weighted k-means++ on the
     candidates on the driver (numpy, tiny).

Determinism: sampling uses ``xxhash64(features-json, seed)`` ordering
and ``rand(seed)`` columns only — stable across runs and partitionings
of the same files (pitfall noted in SURVEY.md §7.3.2).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel
from .assignment import ExpressionAssignment, distances_column

__all__ = ["random_init", "kmeans_parallel_init", "initialize"]


def _hash_order(df: DataFrame, features_col: str, seed: int):
    return F.xxhash64(F.to_json(F.struct(F.col(features_col))), F.lit(seed))


def random_init(df: DataFrame, k: int, features_col: str, seed: int) -> np.ndarray:
    """k distinct seed-stable rows (reference ``CenterInitializer.scala:104-116``
    uses sample+limit; hash ordering is equally cheap and partition-stable)."""
    rows = (
        df.select(F.col(features_col).alias("f"))
        .withColumn("_h", _hash_order(df, features_col, seed))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    centers = np.asarray([r["f"] for r in rows], dtype=np.float64)
    if len(centers) < k:
        raise ValueError(f"k={k} but only {len(centers)} rows available")
    return centers


def _kmeanspp_weighted(cand: np.ndarray, wts: np.ndarray, k: int,
                       kernel: Kernel, seed: int) -> np.ndarray:
    """Classic weighted k-means++ on the (small) candidate set, driver-side."""
    rng = np.random.RandomState(seed)
    n = len(cand)
    if n <= k:
        return cand
    first = rng.choice(n, p=wts / wts.sum())
    chosen = [first]
    d2 = kernel.div_np(cand, cand[[first]])[:, 0]
    for _ in range(1, k):
        probs = np.maximum(d2, 0) * wts
        total = probs.sum()
        if total <= 0:
            idx = rng.choice(n)
        else:
            idx = rng.choice(n, p=probs / total)
        chosen.append(idx)
        d_new = kernel.div_np(cand, cand[[idx]])[:, 0]
        d2 = np.minimum(d2, d_new)
    return cand[chosen]


def kmeans_parallel_init(
    df: DataFrame,
    k: int,
    kernel: Kernel,
    features_col: str,
    seed: int,
    init_steps: int = 2,
    oversampling: float = 2.0,
) -> np.ndarray:
    """Distributed Bahmani k-means|| (arXiv:1203.6402)."""
    l = oversampling * k
    feats = df.select(F.col(features_col).alias("f"))
    centers = random_init(feats, 1, "f", seed).tolist()
    for step in range(init_steps):
        dists = distances_column(kernel, F.col("f"), centers)
        with_d = feats.withColumn("_d2", F.array_min(dists))
        total = with_d.agg(F.sum("_d2").alias("s")).collect()[0]["s"] or 0.0
        if total <= 0:
            break
        sampled = with_d.where(
            F.rand(seed + 17 * step + 1) < F.least(F.lit(1.0), F.lit(l) * F.col("_d2") / F.lit(float(total)))
        ).select("f").collect()
        centers.extend([list(r["f"]) for r in sampled])
        # cap runaway candidate growth
        if len(centers) > max(50 * k, 2000):
            break
    cand = np.asarray(centers, dtype=np.float64)
    if len(cand) <= k:
        extra = random_init(feats, k, "f", seed + 99)
        cand = np.vstack([cand, extra])[: max(k, len(cand))]
        cand = np.unique(cand, axis=0)
        if len(cand) < k:
            raise ValueError(f"could not find {k} distinct candidate centers")
    # weight candidates by covered point count (one aggregation job)
    assigned = ExpressionAssignment().assign(
        feats, kernel, cand.tolist(), "f", cluster_col="_c", dist_col="_dd"
    )
    counts = {int(r["_c"]): r["n"]
              for r in assigned.groupBy("_c").agg(F.count(F.lit(1)).alias("n")).collect()}
    wts = np.array([counts.get(i, 0) for i in range(len(cand))], dtype=np.float64)
    wts = np.maximum(wts, 1e-9)
    return _kmeanspp_weighted(cand, wts, k, kernel, seed)


def initialize(
    df: DataFrame,
    k: int,
    kernel: Kernel,
    features_col: str,
    seed: int,
    init_mode: str = "k-means||",
    init_steps: int = 2,
) -> np.ndarray:
    mode = init_mode.lower().replace("-", "").replace("_", "").replace("||", "parallel")
    if mode in ("random",):
        return random_init(df, k, features_col, seed)
    if mode in ("kmeansparallel", "parallel", "kmeanspp", "kmeans++"):
        return kmeans_parallel_init(df, k, kernel, features_col, seed, init_steps)
    raise ValueError(f"unknown initMode '{init_mode}'")
